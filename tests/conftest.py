import os

# Must be set before jax is imported anywhere.  Tests run on CPU with a
# virtual 8-device mesh (SURVEY.md §4.3); set MVT_TEST_TPU=1 to run the
# suite on real TPU hardware instead.
if not os.environ.get("MVT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
