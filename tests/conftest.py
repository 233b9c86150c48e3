import os

# Tests run on CPU with a virtual 8-device mesh (SURVEY.md §4.3); set
# MVT_TEST_TPU=1 to run the suite on real TPU hardware instead.  The env
# var alone is not enough: site customizations may import jax at
# interpreter startup and force another platform, so also override via
# jax.config (effective until the first backend initialization).
if not os.environ.get("MVT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("MVT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (many static
# block-size/bit-depth specializations), so cache compiled executables across
# runs.  Safe on CPU with the thunk runtime in current jax.

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "xla_gpu_per_fusion_autotune_cache_dir")
