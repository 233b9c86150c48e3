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

# Persistent compilation cache: ONLY for TPU runs (or MVT_JAX_CACHE=1).
# XLA:CPU's AOT executable (de)serializer segfaults intermittently
# inside long pytest processes — observed on both the read path
# (get_executable_and_time) and the write path (put_executable_and_time),
# with "machine features ... +prefer-no-gather" mismatch warnings as the
# tell — so CPU suites rely on the in-process compile cache alone.

if os.environ.get("MVT_TEST_TPU") or os.environ.get("MVT_JAX_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "xla_gpu_per_fusion_autotune_cache_dir")
