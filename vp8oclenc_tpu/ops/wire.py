"""Device→host wire format for per-frame entropy inputs.

The tunnel-attached TPU pays high fixed latency plus low bandwidth per
transfer, so everything the host entropy stage needs (coefficient levels,
per-MB metadata, SSIM) is serialized on device into ONE uint8 buffer, at
~58% of the naive int16/int32 size:

  [0]                lo:    (mbc, 25, 16) int8   levels clipped to ±127
  [mbc*400]          off:   (mbc, 16)     uint16 escape offsets (0xFFFF empty)
  [+mbc*32]          val:   (mbc, 16)     int16  escape values (full level)
  [+mbc*32]          meta8: (mbc, 20)     u8     seg, part, ref, ovf, mvs 8xi16
  [+mbc*20]          ssim:  (mbc,)        f32

Escapes (|level| > 127) are recovered by scatter on the host; a per-MB
overflow flag (more than 16 escapes in one MB — practically unreachable)
makes the caller fall back to materializing the device-resident int16
levels directly.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

ESC_SLOTS = 16


def pack_wire(levels_pack, meta, cur_ssim):
    """Traceable: (mbc,25,16) i16 levels + (mbc,11) i32 meta + (mbc,) f32
    -> flat uint8 wire buffer."""
    mbc = levels_pack.shape[0]
    flat = levels_pack.reshape(mbc, 400).astype(jnp.int32)
    lo = jnp.clip(flat, -128, 127)
    esc = flat != lo
    score = jnp.where(esc, 400 - jnp.arange(400, dtype=jnp.int32)[None, :], 0)
    v, idx = jax.lax.top_k(score, ESC_SLOTS)
    valid = v > 0
    off = jnp.where(valid, idx, 0xFFFF).astype(jnp.uint16)
    vals = jnp.where(valid, jnp.take_along_axis(flat, idx, axis=1),
                     0).astype(jnp.int16)
    ovf = (jnp.sum(esc, axis=1) > ESC_SLOTS).astype(jnp.uint8)

    as_u8 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)
    meta8 = jnp.concatenate([
        meta[:, 0].astype(jnp.uint8)[:, None],
        meta[:, 1].astype(jnp.uint8)[:, None],
        meta[:, 2].astype(jnp.uint8)[:, None],
        ovf[:, None],
        jax.lax.bitcast_convert_type(
            meta[:, 3:11].astype(jnp.int16), jnp.uint8).reshape(mbc, 16),
    ], axis=1)
    return jnp.concatenate([
        as_u8(lo.astype(jnp.int8)), as_u8(off), as_u8(vals),
        meta8.reshape(-1), as_u8(cur_ssim.astype(jnp.float32))])


@lru_cache(maxsize=8)
def _cachehook_build_wire_kernel(mbc: int):
    @jax.jit
    def kernel(levels_pack, meta, cur_ssim):
        return pack_wire(levels_pack, meta, cur_ssim)
    return kernel


def build_wire_kernel(mbc: int):
    from vp8oclenc_tpu.utils.jaxcache import enable
    enable()
    return _cachehook_build_wire_kernel(mbc)


def wire_size(mbc: int) -> int:
    return mbc * (400 + 2 * ESC_SLOTS * 2 + 20 + 4)


def unpack_wire(buf: np.ndarray, mbc: int):
    """numpy: wire buffer -> (levels (mbc,25,16) i16, seg, part, ref,
    mvs (mbc,4,2) i16, ovf (mbc,) u8, ssim (mbc,) f64)."""
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    o = 0
    lo = buf[o:o + mbc * 400].view(np.int8).astype(np.int16).reshape(mbc, 400)
    o += mbc * 400
    off = buf[o:o + mbc * ESC_SLOTS * 2].view("<u2").reshape(mbc, ESC_SLOTS)
    o += mbc * ESC_SLOTS * 2
    val = buf[o:o + mbc * ESC_SLOTS * 2].view("<i2").reshape(mbc, ESC_SLOTS)
    o += mbc * ESC_SLOTS * 2
    meta8 = buf[o:o + mbc * 20].reshape(mbc, 20)
    o += mbc * 20
    ssim = buf[o:o + mbc * 4].view("<f4").astype(np.float64)

    m = off != 0xFFFF
    rows = np.nonzero(m)[0]
    lo[rows, off[m]] = val[m]
    seg = meta8[:, 0].astype(np.int32)
    part = meta8[:, 1].astype(np.int32)
    ref = meta8[:, 2].astype(np.int32)
    ovf = meta8[:, 3].copy()
    mvs = np.ascontiguousarray(meta8[:, 4:20]).view("<i2").reshape(mbc, 4, 2)
    return lo.reshape(mbc, 25, 16), seg, part, ref, mvs, ovf, ssim
