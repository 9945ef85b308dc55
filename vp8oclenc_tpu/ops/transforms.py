"""JAX (TPU) VP8 transforms — integer-exact counterparts of spec/transforms.py.

Everything is int32, static shapes, stacking instead of in-place writes so XLA
can fuse freely.  Bit-for-bit equality with the numpy spec oracle is enforced
by tests/test_tpu_backend.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vp8oclenc_tpu.tables import (COSPI8SQRT2MINUS1, COST_SHIFT, INV_ZIGZAG,
                                  SINPI8SQRT2, ZIGZAG)


def fdct4x4(block):
    x = block.astype(jnp.int32)
    a1 = (x[..., :, 0] + x[..., :, 3]) << 3
    b1 = (x[..., :, 1] + x[..., :, 2]) << 3
    c1 = (x[..., :, 1] - x[..., :, 2]) << 3
    d1 = (x[..., :, 0] - x[..., :, 3]) << 3
    t = jnp.stack([a1 + b1,
                   (c1 * 2217 + d1 * 5352 + 14500) >> 12,
                   a1 - b1,
                   (d1 * 2217 - c1 * 5352 + 7500) >> 12], axis=-1)
    a1 = t[..., 0, :] + t[..., 3, :]
    b1 = t[..., 1, :] + t[..., 2, :]
    c1 = t[..., 1, :] - t[..., 2, :]
    d1 = t[..., 0, :] - t[..., 3, :]
    return jnp.stack([(a1 + b1 + 7) >> 4,
                      ((c1 * 2217 + d1 * 5352 + 12000) >> 16)
                      + (d1 != 0).astype(jnp.int32),
                      (a1 - b1 + 7) >> 4,
                      (d1 * 2217 - c1 * 5352 + 51000) >> 16], axis=-2)


def _q_grid(c, dc_q, ac_q):
    ac = jnp.broadcast_to(jnp.asarray(ac_q, jnp.int32)[..., None, None], c.shape)
    dc = jnp.broadcast_to(jnp.asarray(dc_q, jnp.int32)[..., None, None], c.shape)
    mask = (jnp.arange(4)[:, None] == 0) & (jnp.arange(4)[None, :] == 0)
    return jnp.where(mask, dc, ac)


def quant4x4(coeffs, dc_q, ac_q):
    c = coeffs.astype(jnp.int32)
    q = _q_grid(c, dc_q, ac_q)
    a = c + jnp.where(c < 0, -(q // 2), q // 2)
    return jnp.where(a < 0, -((-a) // q), a // q)


def dequant4x4(levels, dc_q, ac_q):
    c = levels.astype(jnp.int32)
    q = _q_grid(c, dc_q, ac_q)
    return c * q


def idct4x4(dq):
    ip = dq.astype(jnp.int32)
    a1 = ip[..., 0, :] + ip[..., 2, :]
    b1 = ip[..., 0, :] - ip[..., 2, :]
    c1 = ((ip[..., 1, :] * SINPI8SQRT2) >> 16) \
        - (ip[..., 3, :] + ((ip[..., 3, :] * COSPI8SQRT2MINUS1) >> 16))
    d1 = (ip[..., 1, :] + ((ip[..., 1, :] * COSPI8SQRT2MINUS1) >> 16)) \
        + ((ip[..., 3, :] * SINPI8SQRT2) >> 16)
    t = jnp.stack([a1 + d1, b1 + c1, b1 - c1, a1 - d1], axis=-2)
    a1 = t[..., :, 0] + t[..., :, 2]
    b1 = t[..., :, 0] - t[..., :, 2]
    c1 = ((t[..., :, 1] * SINPI8SQRT2) >> 16) \
        - (t[..., :, 3] + ((t[..., :, 3] * COSPI8SQRT2MINUS1) >> 16))
    d1 = (t[..., :, 1] + ((t[..., :, 1] * COSPI8SQRT2MINUS1) >> 16)) \
        + ((t[..., :, 3] * SINPI8SQRT2) >> 16)
    return jnp.stack([(a1 + d1 + 4) >> 3,
                      (b1 + c1 + 4) >> 3,
                      (b1 - c1 + 4) >> 3,
                      (a1 - d1 + 4) >> 3], axis=-1)


def fwht4x4(dcs):
    x = dcs.astype(jnp.int32)
    a = x[..., 0, :] + x[..., 3, :]
    b = x[..., 1, :] + x[..., 2, :]
    c = x[..., 1, :] - x[..., 2, :]
    d = x[..., 0, :] - x[..., 3, :]
    t = jnp.stack([a + b, c + d, a - b, d - c], axis=-2)
    a = t[..., :, 0] + t[..., :, 3]
    b = t[..., :, 1] + t[..., :, 2]
    c = t[..., :, 1] - t[..., :, 2]
    d = t[..., :, 0] - t[..., :, 3]
    o = jnp.stack([a + b, c + d, a - b, d - c], axis=-1)
    return (o + (o > 0).astype(jnp.int32)) >> 1


def iwht4x4(dq):
    x = dq.astype(jnp.int32)
    a = x[..., :, 0] + x[..., :, 3]
    b = x[..., :, 1] + x[..., :, 2]
    c = x[..., :, 1] - x[..., :, 2]
    d = x[..., :, 0] - x[..., :, 3]
    t = jnp.stack([a + b, c + d, a - b, d - c], axis=-1)
    a = t[..., 0, :] + t[..., 3, :]
    b = t[..., 1, :] + t[..., 2, :]
    c = t[..., 1, :] - t[..., 2, :]
    d = t[..., 0, :] - t[..., 3, :]
    o = jnp.stack([a + b, c + d, a - b, d - c], axis=-2)
    return (o + 3) >> 3


def zigzag(block):
    flat = block.reshape(*block.shape[:-2], 16)
    return flat[..., ZIGZAG]


def inv_zigzag(scan):
    return scan[..., INV_ZIGZAG].reshape(*scan.shape[:-1], 4, 4)


def _cost_consts():
    import numpy as np
    from vp8oclenc_tpu.tables import COST_M16, COST_W16
    m128 = np.zeros((128, 128), dtype=np.float32)
    for k in range(8):
        m128[k * 16:(k + 1) * 16, k * 16:(k + 1) * 16] = COST_M16.T
    w128 = np.tile(COST_W16, 8).astype(np.float32)
    return m128, w128


_COST_M128, _COST_W128 = _cost_consts()


def _cost_consts64():
    """64-wide cost operator for row-major 8x8 residual blocks.

    The quad-splitting permutation (8x8 row-major -> four 4x4 quads) is
    folded INTO the matrix: out[q*16+j] = sum_{r,c} M16[j, 4r+c] *
    x[(4*qy+r)*8 + 4*qx + c].  Feeding (..., 64) rows straight to the MXU
    avoids the (..., 2, 4, 2, 4) transpose whose TPU tiling T(4,128) pads
    each 4-wide minor dim to 128 lanes — a 16x physical inflation that
    OOMs HBM at 1080p candidate-batch sizes."""
    import numpy as np
    from vp8oclenc_tpu.tables import COST_M16, COST_W16
    m64 = np.zeros((64, 64), dtype=np.float32)
    for q in range(4):
        qy, qx = q // 2, q % 2
        for j in range(16):
            for r in range(4):
                for c in range(4):
                    m64[(4 * qy + r) * 8 + 4 * qx + c,
                        q * 16 + j] = COST_M16[j, r * 4 + c]
    m128 = np.zeros((128, 128), dtype=np.float32)
    m128[:64, :64] = m64
    m128[64:, 64:] = m64
    w128 = np.tile(COST_W16, 8).astype(np.float32)
    return m128, w128


_COST_M128_B8, _COST_W128_B8 = _cost_consts64()


def dct_cost_rows64(rows64):
    """Per-8x8-block ME cost from row-major (..., 64) residual rows
    (bfloat16 holding exact integers in [-255, 255], or any int dtype)
    -> (...,) int32.  Bit-identical to dct_weight over the four quads
    (same per-quad >> COST_SHIFT before the quad sum); the input layout is
    MXU-native so no transposes/copies materialize."""
    import numpy as np
    lead = rows64.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    pad = (-n) % 2
    from vp8oclenc_tpu.utils.hostconst import host_const
    if rows64.dtype == jnp.bfloat16:
        flat = rows64.reshape(n, 64)
        mat = host_const(_COST_M128_B8, "bfloat16")
    else:
        flat = rows64.reshape(n, 64).astype(jnp.float32)
        mat = host_const(_COST_M128_B8)
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, 64), flat.dtype)], axis=0)
    x = flat.reshape(-1, 128)
    c = jnp.abs(jax.lax.dot_general(
        x, mat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    s = (c.reshape(-1, 8, 16) * jnp.asarray(_COST_W128_B8).reshape(8, 16)) \
        .sum(axis=-1)
    quads = s.reshape(-1, 4).astype(jnp.int32) >> COST_SHIFT
    out = quads.sum(axis=-1).reshape(-1)[:n]
    return out.reshape(lead)


def dct_cost(quads16):
    """ME/mode cost metric (spec/transforms.py:dct_cost, tables.COST_M16)
    evaluated as one block-diagonal (N/8, 128) @ (128, 128) matmul on the
    MXU, bit-exact against the int64 numpy oracle: residuals (|x| <= 255)
    and table entries (|m| <= 100) are integers exactly representable in
    bf16, the MXU accumulates their exact products in f32, per-coefficient
    sums are < 2^18, and the weighted total is bounded by
    255 * sum_k w_k * rowabssum_k = 13.9M < 2^24 — every f32 intermediate is
    an exactly-representable integer (verified by
    tests/test_tpu_backend.py::test_dct_cost_matmul_exact).

    quads16: (..., 16) int32 — or bfloat16 holding exact integers in
    [-255, 255] (the hot search path forms residuals directly in bf16 to
    halve HBM traffic and feed the MXU natively; exactness is unchanged
    because bf16 represents every integer up to 256) — row-major 4x4
    residuals -> (...,) int32.
    """
    import numpy as np
    lead = quads16.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    pad = (-n) % 8
    from vp8oclenc_tpu.utils.hostconst import host_const
    if quads16.dtype == jnp.bfloat16:
        flat = quads16.reshape(n, 16)
        mat = host_const(_COST_M128, "bfloat16")
    else:
        flat = quads16.reshape(n, 16).astype(jnp.float32)
        mat = host_const(_COST_M128)
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, 16), flat.dtype)], axis=0)
    x = flat.reshape(-1, 128)
    c = jnp.abs(jax.lax.dot_general(
        x, mat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    s = (c.reshape(-1, 8, 16) * jnp.asarray(_COST_W128).reshape(8, 16)) \
        .sum(axis=-1)
    out = s.reshape(-1)[:n].astype(jnp.int32) >> COST_SHIFT
    return out.reshape(lead)


def dct_weight(residual):
    return dct_cost(residual.reshape(*residual.shape[:-2], 16))
