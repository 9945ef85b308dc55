"""Device→host wire format for per-frame entropy inputs (v2, compacted).

The tunnel-attached TPU pays high fixed latency plus low bandwidth per
transfer.  Coefficient levels are overwhelmingly zero, so the frame's
host-bound data is split into a small fixed-size HEAD and a variable-size
BODY of which the host fetches only the used prefix (mirroring the reference
architecture where only compact data leaves the coding device,
/root/reference/src/CPU_kernels.cl:347-778 + readback encIO.h:1-30):

HEAD (fixed, ~31 B/MB):
  [0:4]    n_active  i32   number of 4x4 blocks with any nonzero level
  [4:8]    flags     i32   bit0: escape overflow somewhere (fallback needed)
  [8:12]   ssim_min  i32   per-frame Q15 SSIM aggregates (print-info + the
  [12:16]  sum_hi    i32   weaken-filter rule, vp8enc.cpp:258, 247); the sum
  [16:20]  sum_lo    i32   is carried as hi/lo 12-bit-split words of the
                           biased per-MB score so it cannot wrap int32 even
                           at 8K (mbc*98304 > 2^31 for mbc > 21845):
                           sum_fx = (hi<<12) + lo - 98304*mbc
  [20:24]  replaced  i32   SSIM-controller intra-replaced MB count
  [24:+ceil(25*mbc/8)]     active-block bitmap (little-endian bits)
  [+mbc*20]                meta8: seg, part, ref, esc_ovf, mvs 8xi16
  [+mbc*4]                 esc_off: (mbc, 2) u16 dense-coord escape offsets
  [+mbc*4]                 esc_val: (mbc, 2) i16 escape values

BODY (device-resident until finalize):
  (25*mbc*16,) u8 — int8 levels of the active blocks compacted to the
  front in block order; the host fetches body[:n_active*16] only.

STATS: (4,) i32 [replaced, ssim_min, sum_hi, sum_lo] — the 16-byte sync
read that drives the redo-as-key decision (check_SSIM, vp8enc.cpp:443-453)
without waiting on the full head transfer.

Escapes (|level| > 127, at most 2 per MB before the dense fallback kicks
in) are patched on the host after reconstruction.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

ESC_SLOTS = 2


def pack_wire(levels_pack, meta, cur_ssim, replaced):
    """Traceable: (mbc,25,16) int levels + (mbc,11) i32 meta + (mbc,) i32
    Q15 SSIM + scalar i32 replaced-count
    -> (head u8 vector, body u8 vector, stats (3,) i32)."""
    mbc = levels_pack.shape[0]
    nb = mbc * 25
    blocks = levels_pack.reshape(nb, 16).astype(jnp.int16)
    active = jnp.any(blocks != 0, axis=1)
    n_active = active.sum().astype(jnp.int32)

    # bitmap (little-endian bit order to match np.unpackbits(bitorder="little"))
    nb8 = -(-nb // 8) * 8
    apad = jnp.pad(active.astype(jnp.uint8), (0, nb8 - nb))
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    bitmap = (apad.reshape(nb8 // 8, 8) * weights[None, :]).sum(
        axis=1, dtype=jnp.uint8)

    # stable-sort compaction: active blocks to the front in original order
    key = (~active).astype(jnp.int32)
    _, src = jax.lax.sort((key, jnp.arange(nb, dtype=jnp.int32)),
                          num_keys=1, is_stable=True)
    gath = jnp.take(blocks, src, axis=0)                 # (nb, 16) i16
    lo = jnp.clip(gath, -128, 127).astype(jnp.int8)
    body = jax.lax.bitcast_convert_type(lo, jnp.uint8).reshape(-1)

    # per-MB escapes in dense (mb, 400) coordinates, patched host-side
    flat = levels_pack.reshape(mbc, 400).astype(jnp.int32)
    esc = flat != jnp.clip(flat, -128, 127)
    score = jnp.where(esc, 400 - jnp.arange(400, dtype=jnp.int32)[None, :], 0)
    v, idx = jax.lax.top_k(score, ESC_SLOTS)
    valid = v > 0
    esc_off = jnp.where(valid, idx, 0xFFFF).astype(jnp.uint16)
    esc_val = jnp.where(valid, jnp.take_along_axis(flat, idx, axis=1),
                        0).astype(jnp.int16)
    esc_ovf = (jnp.sum(esc, axis=1) > ESC_SLOTS).astype(jnp.uint8)
    flags = jnp.any(esc_ovf).astype(jnp.int32)

    as_u8 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)
    meta8 = jnp.concatenate([
        meta[:, 0].astype(jnp.uint8)[:, None],
        meta[:, 1].astype(jnp.uint8)[:, None],
        meta[:, 2].astype(jnp.uint8)[:, None],
        esc_ovf[:, None],
        jax.lax.bitcast_convert_type(
            meta[:, 3:11].astype(jnp.int16), jnp.uint8).reshape(mbc, 16),
    ], axis=1)

    # each MB clamps at -1.0 (-Q3, matching spec/inter.py's int64 sum; DC
    # penalties can push fx below -Q3), then the biased score (0..196608)
    # is split 12-bit hi/lo so neither partial sum can wrap int32 at any
    # frame size up to ~500k MBs (sum_lo <= mbc*4095, sum_hi <= mbc*48)
    ssim_min = cur_ssim.min().astype(jnp.int32)
    w = jnp.maximum(cur_ssim, -98304) + 98304
    sum_hi = (w >> 12).sum().astype(jnp.int32)
    sum_lo = (w & 4095).sum().astype(jnp.int32)
    replaced = jnp.asarray(replaced, jnp.int32)
    head = jnp.concatenate([
        as_u8(n_active), as_u8(flags), as_u8(ssim_min), as_u8(sum_hi),
        as_u8(sum_lo), as_u8(replaced),
        bitmap, meta8.reshape(-1), as_u8(esc_off), as_u8(esc_val)])
    stats = jnp.stack([replaced, ssim_min, sum_hi, sum_lo])
    return head, body, stats


@lru_cache(maxsize=8)
def _cachehook_build_wire_kernel(mbc: int):
    @jax.jit
    def kernel(levels_pack, meta, cur_ssim, replaced):
        return pack_wire(levels_pack, meta, cur_ssim, replaced)
    return kernel


from functools import partial


@partial(jax.jit, static_argnums=2)
def head_plus_body(head, body, bucket: int):
    """head ++ body[:bucket] as ONE u8 buffer.

    Every device->host readback through the tunnel pays a ~22 ms
    synchronization latency regardless of size, so the head and the body
    prefix are fetched in a single transfer.  `bucket` (a power-of-two
    guess from the previous frame's used size) is static: one cached
    executable per bucket size."""
    return jnp.concatenate(
        [head, jax.lax.slice_in_dim(body, 0, bucket, axis=0)])


def warm_buckets(mbc: int) -> None:
    """Pre-compile head_plus_body for every reachable bucket size so a
    mid-stream body-size jump never stalls a frame on a fresh XLA compile
    (each costs ~0.5-0.8 s through the remote tunnel)."""
    hs = head_size(mbc)
    cap = body_capacity(mbc)
    head = jnp.zeros(hs, jnp.uint8)
    body = jnp.zeros(cap, jnp.uint8)
    b = 1 << 16
    outs = []
    while True:
        outs.append(head_plus_body(head, body, min(b, cap)))
        if b >= cap:
            break
        b <<= 1
    jax.block_until_ready(outs)


def pick_bucket(n_bytes: int, cap: int) -> int:
    """Smallest power-of-two >= max(n_bytes, 128 KiB), clamped to the body
    capacity (the floor costs ~3 ms of streaming; an undershoot costs a
    second synchronous fetch)."""
    b = 1 << 17
    while b < n_bytes:
        b <<= 1
    return min(b, cap)


def build_wire_kernel(mbc: int):
    from vp8oclenc_tpu.utils.jaxcache import enable
    enable()
    return _cachehook_build_wire_kernel(mbc)


def head_size(mbc: int) -> int:
    nb = mbc * 25
    return 24 + (-(-nb // 8)) + mbc * 20 + mbc * ESC_SLOTS * 4


def stats_sum_fx(sum_hi: int, sum_lo: int, mbc: int) -> int:
    """Reassemble the exact int ssim_sum from the hi/lo split words."""
    return (int(sum_hi) << 12) + int(sum_lo) - 98304 * mbc


def body_capacity(mbc: int) -> int:
    return mbc * 25 * 16


def unpack_head(head: np.ndarray, mbc: int) -> dict:
    """numpy: head buffer -> dict of parsed fields (no levels yet)."""
    head = np.ascontiguousarray(head, dtype=np.uint8)
    nb = mbc * 25
    nbm = -(-nb // 8)
    n_active = int(head[0:4].view("<i4")[0])
    flags = int(head[4:8].view("<i4")[0])
    ssim_min_fx = int(head[8:12].view("<i4")[0])
    sum_hi = int(head[12:16].view("<i4")[0])
    sum_lo = int(head[16:20].view("<i4")[0])
    ssim_sum_fx = stats_sum_fx(sum_hi, sum_lo, mbc)
    replaced = int(head[20:24].view("<i4")[0])
    o = 24
    bitmap = head[o:o + nbm]
    o += nbm
    meta8 = head[o:o + mbc * 20].reshape(mbc, 20)
    o += mbc * 20
    esc_off = head[o:o + mbc * ESC_SLOTS * 2].view("<u2").reshape(mbc, ESC_SLOTS)
    o += mbc * ESC_SLOTS * 2
    esc_val = head[o:o + mbc * ESC_SLOTS * 2].view("<i2").reshape(mbc, ESC_SLOTS)

    active = np.unpackbits(bitmap, bitorder="little")[:nb].astype(bool)
    return dict(
        n_active=n_active, esc_overflow=bool(flags & 1),
        ssim_min_fx=ssim_min_fx, ssim_sum_fx=ssim_sum_fx, replaced=replaced,
        active=active,
        seg=meta8[:, 0].astype(np.int32), part=meta8[:, 1].astype(np.int32),
        ref=meta8[:, 2].astype(np.int32), ovf=meta8[:, 3].copy(),
        mvs=np.ascontiguousarray(meta8[:, 4:20]).view("<i2").reshape(mbc, 4, 2),
        esc_off=esc_off, esc_val=esc_val)


def unpack_modes4(modes4: np.ndarray, mbc: int) -> np.ndarray:
    """numpy: (mbc*8,) u8 nibble-packed bmodes -> (mbc, 16) int8."""
    m = np.ascontiguousarray(modes4, dtype=np.uint8).reshape(mbc, 8)
    out = np.empty((mbc, 16), np.int8)
    out[:, 0::2] = (m & 0x0F).astype(np.int8)
    out[:, 1::2] = (m >> 4).astype(np.int8)
    return out


def unpack_levels(info: dict, body_prefix: np.ndarray, mbc: int) -> np.ndarray:
    """numpy: parsed head + the fetched body[:n_active*16] prefix
    -> dense (mbc, 25, 16) int16 levels."""
    nb = mbc * 25
    lo = np.zeros((nb, 16), dtype=np.int16)
    rows = np.nonzero(info["active"])[0]
    if info["n_active"]:
        lo[rows] = np.ascontiguousarray(
            body_prefix[: info["n_active"] * 16], dtype=np.uint8) \
            .view(np.int8).astype(np.int16).reshape(info["n_active"], 16)
    levels = lo.reshape(mbc, 25, 16)
    m = info["esc_off"] != 0xFFFF
    r = np.nonzero(m)[0]
    levels.reshape(mbc, 400)[r, info["esc_off"][m]] = info["esc_val"][m]
    return levels
