"""Jitted wavefront loop filter — TPU counterpart of spec/loopfilter.py.

The decoder-mandated MB raster order is relaxed to the anti-diagonal
wavefront d = mbx + 2*mby (proved safe: a MB's filtering reads only its own
and its left/top neighbors' pixels, all complete at stage d; same-stage MBs
have disjoint read/write windows).  This is the same dependency schedule as
the reference's GPU wavefront filter (/root/reference/src/loop_filter.h:69-135,
bin/GPU_kernels.cl:1812-2089) but whole-MB per stage.

Each stage gathers per-MB windows (20x20 luma / 12x12 chroma, 4-px top-left
halo), applies the 8 (4 chroma) edge filters sequentially inside the window
with lane vectorization, and scatters back.  Bit-identical to the sequential
spec oracle.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from vp8oclenc_tpu.spec.loopfilter import filter_b_edge, filter_mb_edge


def _filter_window(win, mb_lim, b_lim, int_lim, hev_thr, has_left, has_top,
                   inner, active, mb_size: int):
    """Apply all edges of one MB inside its window.

    win: (K, S, S) int32 in the -128..127 domain, S = mb_size + 4; the MB
    occupies [4:, 4:].  Limit args: (K, 1) for lane broadcast.  Flags: (K,).
    Returns the filtered window."""
    S = mb_size + 4
    c = lambda v: jnp.clip(v, -128, 127)

    def vedge(w, x, kind, cond):
        cols = [w[:, 4:, x - 4 + i] for i in range(8)]
        if kind == "mb":
            out = filter_mb_edge(*cols, mb_lim, int_lim, hev_thr, xp=jnp)
            sl = slice(x - 3, x + 3)
        else:
            out = filter_b_edge(*cols, b_lim, int_lim, hev_thr, xp=jnp)
            sl = slice(x - 2, x + 2)
        new = jnp.stack([c(o) for o in out], axis=-1)         # (K, rows, n)
        old = w[:, 4:, sl]
        return w.at[:, 4:, sl].set(jnp.where(cond[:, None, None], new, old))

    def hedge(w, y, kind, cond):
        rows = [w[:, y - 4 + i, 4:] for i in range(8)]
        if kind == "mb":
            out = filter_mb_edge(*rows, mb_lim, int_lim, hev_thr, xp=jnp)
            sl = slice(y - 3, y + 3)
        else:
            out = filter_b_edge(*rows, b_lim, int_lim, hev_thr, xp=jnp)
            sl = slice(y - 2, y + 2)
        new = jnp.stack([c(o) for o in out], axis=-2)         # (K, n, cols)
        old = w[:, sl, 4:]
        return w.at[:, sl, 4:].set(jnp.where(cond[:, None, None], new, old))

    win = vedge(win, 4, "mb", active & has_left)
    for x in range(8, S, 4):
        win = vedge(win, x, "b", active & inner)
    win = hedge(win, 4, "mb", active & has_top)
    for y in range(8, S, 4):
        win = hedge(win, y, "b", active & inner)
    return win


def _plane_pass(plane, diag_by, diag_bx, seg_of_mb, levels, mbe, sbe, intr,
                hev, inner_mask, mb_size: int, mbw: int, mbh: int):
    """Run the wavefront over one plane (levels etc: (4,) segment tables)."""
    S = mb_size + 4
    H = mbh * mb_size
    W = mbw * mb_size
    # pad: 4 left/top halo; right needs none; bottom: scratch for idle lanes
    pad = jnp.pad(plane.astype(jnp.int32), ((4, S), (4, 0)),
                  constant_values=128) - 128

    def step(d, p):
        mby = diag_by[d]
        mbx = diag_bx[d]
        valid = mby >= 0
        byc = jnp.maximum(mby, 0)
        bxc = jnp.maximum(mbx, 0)
        mbn = byc * mbw + bxc
        sid = seg_of_mb[mbn]
        lvl = levels[sid]
        active = valid & (lvl > 0)
        r0 = jnp.where(valid, byc * mb_size, H + 4)   # scratch rows when idle
        c0 = bxc * mb_size
        rows = r0[:, None] + jnp.arange(S)[None, :]
        cols = c0[:, None] + jnp.arange(S)[None, :]
        win = p[rows[:, :, None], cols[:, None, :]]
        win = _filter_window(
            win, mbe[sid][:, None], sbe[sid][:, None], intr[sid][:, None],
            hev[sid][:, None], bxc > 0, byc > 0, inner_mask[mbn], active,
            mb_size)
        return p.at[rows[:, :, None], cols[:, None, :]].set(win)

    pad = jax.lax.fori_loop(0, diag_by.shape[0], step, pad)
    return jnp.clip(pad[4:4 + H, 4:4 + W] + 128, 0, 255).astype(jnp.uint8)


def filter_planes(ry, ru, rv, seg_of_mb, inner_mask, levels, mbe, sbe, intr,
                  hev, dby, dbx, mbw: int, mbh: int):
    """Traceable whole-frame filter (reused inside the fused pixel kernels)."""
    ry = _plane_pass(ry, dby, dbx, seg_of_mb, levels, mbe, sbe, intr, hev,
                     inner_mask, 16, mbw, mbh)
    ru = _plane_pass(ru, dby, dbx, seg_of_mb, levels, mbe, sbe, intr, hev,
                     inner_mask, 8, mbw, mbh)
    rv = _plane_pass(rv, dby, dbx, seg_of_mb, levels, mbe, sbe, intr, hev,
                     inner_mask, 8, mbw, mbh)
    return ry, ru, rv


@lru_cache(maxsize=8)
def _cachehook_build_loopfilter_kernel(mbw: int, mbh: int):
    tables = tuple(jax.device_put(t) for t in _diag_tables(mbw, mbh))

    @jax.jit
    def kernel(ry, ru, rv, seg_of_mb, inner_mask, levels, mbe, sbe, intr, hev,
               dby, dbx):
        return filter_planes(ry, ru, rv, seg_of_mb, inner_mask, levels, mbe,
                             sbe, intr, hev, dby, dbx, mbw, mbh)

    def run(*args):
        return kernel(*args, *tables)

    return run


def _diag_tables(mbw: int, mbh: int):
    """Anti-diagonal d = mbx + 2*mby tables with -1 sentinels."""
    D = (mbw - 1) + 2 * (mbh - 1) + 1
    K = max(1, min(mbh, (mbw + 1) // 2))
    by = np.full((D, K), -1, dtype=np.int32)
    bx = np.full((D, K), -1, dtype=np.int32)
    for d in range(D):
        k = 0
        lo = max(0, (d - (mbw - 1) + 1) // 2)
        hi = min(mbh - 1, d // 2)
        for yy in range(lo, hi + 1):
            xx = d - 2 * yy
            if 0 <= xx < mbw:
                by[d, k] = yy
                bx[d, k] = xx
                k += 1
    return by, bx


def loop_filter_frame_tpu(ry, ru, rv, segment_ids, inner_mask, seg):
    H, W = ry.shape
    mbw, mbh = W // 16, H // 16
    kern = build_loopfilter_kernel(mbw, mbh)
    out = kern(jnp.asarray(ry), jnp.asarray(ru), jnp.asarray(rv),
               jnp.asarray(np.asarray(segment_ids, dtype=np.int32)),
               jnp.asarray(np.asarray(inner_mask, dtype=bool)),
               jnp.asarray(np.asarray(seg.loop_filter_level, dtype=np.int32)),
               jnp.asarray(np.asarray(seg.mbedge_limit, dtype=np.int32)),
               jnp.asarray(np.asarray(seg.sub_bedge_limit, dtype=np.int32)),
               jnp.asarray(np.asarray(seg.interior_limit, dtype=np.int32)),
               jnp.asarray(np.asarray(seg.hev_threshold, dtype=np.int32)))
    return tuple(np.asarray(o) for o in out)


@lru_cache(maxsize=8)
def _cachehook_build_filter_from_meta_kernel(mbw: int, mbh: int):
    """Loop filter fed directly from the inter kernel's device outputs —
    skip/inner/segment ids derived on-device so the filter chains
    asynchronously behind the pixel kernel (host entropy overlaps it).

    lf: (2, 5, 4) [normal/weakened][level,mbe,sbe,interior,hev] per segment;
    the weakened set is selected on-device when min SSIM > 0.95
    (check_SSIM, /root/reference/src/vp8enc.cpp:260-261)."""
    tables = tuple(jax.device_put(t) for t in _diag_tables(mbw, mbh))

    @jax.jit
    def kernel(ry, ru, rv, levels_pack, meta, cur_ssim, lf, dby, dbx):
        seg_ids = meta[:, 0]
        parts = meta[:, 1]
        a = jnp.abs(levels_pack.astype(jnp.int32))
        nzc = (a[:, :16, 1:].sum(axis=(1, 2)) + a[:, 16:24].sum(axis=(1, 2))
               + a[:, :16, 0].sum(axis=1) + a[:, 24].sum(axis=1))
        inner = (parts != 0) | (nzc != 0)      # ARE16X16 == 0
        weaken = jnp.min(cur_ssim) > 0.95
        lf_use = jnp.where(weaken, lf[1], lf[0])
        return filter_planes(ry, ru, rv, seg_ids, inner,
                             lf_use[0], lf_use[1], lf_use[2], lf_use[3],
                             lf_use[4], dby, dbx, mbw, mbh)

    def run(*args):
        return kernel(*args, *tables)

    return run


def build_loopfilter_kernel(mbw: int, mbh: int):
    from vp8oclenc_tpu.utils.jaxcache import enable
    enable()
    return _cachehook_build_loopfilter_kernel(mbw, mbh)


def build_filter_from_meta_kernel(mbw: int, mbh: int):
    from vp8oclenc_tpu.utils.jaxcache import enable
    enable()
    return _cachehook_build_filter_from_meta_kernel(mbw, mbh)
