import os
import sys

# Run all JAX tests on a virtual multi-device CPU mesh; the real TPU is used
# only by bench.py / the driver.  Must be set before jax is imported anywhere.
# NOTE: the environment pre-sets JAX_PLATFORMS=axon (remote TPU tunnel), so
# this must be an overwrite, not setdefault — otherwise every jnp constant
# lives across the tunnel and lowering takes minutes.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
