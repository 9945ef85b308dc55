"""Host-pinned compile-time constants.

A `jnp.asarray(numpy)` inside a jit trace commits the constant to the
DEFAULT device; MLIR lowering then calls `._value` on it, fetching the
bytes BACK from the device.  Through the remote-TPU tunnel (~11-55 MB/s)
the ~10 MB of motion-search constant operators made every fresh lowering
take minutes (observed as multi-minute "hangs" on first use of a
resolution).  Pinning the constant to the host CPU device makes
`ir_constant` read local memory; XLA still bakes it into the TPU
executable.
"""
from __future__ import annotations

import numpy as np


def host_const(a, dtype=None):
    """numpy array -> CPU-committed jax array usable as an in-trace
    constant without a device round-trip at lowering time."""
    import jax
    import ml_dtypes

    if dtype is not None:
        np_dtype = {"bfloat16": ml_dtypes.bfloat16}.get(str(dtype), dtype)
        a = np.asarray(a, np_dtype)
    else:
        a = np.asarray(a)
    try:
        cpu = jax.devices("cpu")[0]
        return jax.device_put(a, cpu)
    except Exception:
        import jax.numpy as jnp
        return jnp.asarray(a)
