import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Run tests on a local CPU backend with a virtual 8-device mesh.  NOTE: in
# this environment the axon TPU plugin ignores JAX_PLATFORMS/XLA_FLAGS env
# vars — only jax.config.update() actually switches the backend.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
