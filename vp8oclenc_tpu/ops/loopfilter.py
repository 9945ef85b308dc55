"""Jitted wavefront loop filter — TPU counterpart of spec/loopfilter.py.

The decoder-mandated MB raster order is relaxed to the anti-diagonal
wavefront d = mbx + 2*mby (proved safe: a MB's filtering reads only its own
and its left/top neighbors' pixels, all complete at stage d; same-stage MBs
have disjoint read/write windows).  This is the same dependency schedule as
the reference's GPU wavefront filter (/root/reference/src/loop_filter.h:69-135,
bin/GPU_kernels.cl:1812-2089) but whole-MB per stage.

The planes are *sheared* (band b shifted right by two MB widths per band)
so all MBs of a stage share one column range: each stage is a static-size
dynamic slice + the 8 (4 chroma) edge filters vectorized over the band lanes
+ a dynamic update — no arbitrary gathers/scatters anywhere.  Bit-identical
to the sequential spec oracle.
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


def _shear(plane, msize: int, mbw: int, mbh: int, totc: int):
    """(mbh*msize, mbw*msize) u8 -> (mbh, msize, totc) int32 in the -128..127
    domain, band b shifted right by 4 + 2*msize*b.  In sheared coordinates
    every MB of wavefront stage d = mbx + 2*mby sits at the SAME column
    4 + msize*d, so each stage is one static-size dynamic slice instead of
    an arbitrary (slow) gather/scatter."""
    shift = 2 * msize
    lp = shift + 4          # left margin: stage-0 top-halo slice must not
    w = mbw * msize         # clamp into the own-window region
    bands = plane.reshape(mbh, msize, w).astype(jnp.int32) - 128
    rows = []
    for b in range(mbh):
        l = lp + shift * b
        rows.append(jnp.pad(bands[b], ((0, 0), (l, totc - w - l))))
    return jnp.stack(rows)


def _unshear(S, msize: int, mbw: int, mbh: int):
    shift = 2 * msize
    lp = shift + 4
    w = mbw * msize
    outs = [S[b, :, lp + shift * b: lp + shift * b + w] for b in range(mbh)]
    x = jnp.stack(outs).reshape(mbh * msize, w)
    return jnp.clip(x + 128, 0, 255).astype(jnp.uint8)


def filter_planes(ry, ru, rv, seg_of_mb, inner_mask, levels, mbe, sbe, intr,
                  hev, mbw: int, mbh: int):
    """Traceable whole-frame filter (reused inside the fused pixel kernels).

    Wavefront over anti-diagonals d = mbx + 2*mby (the reference GPU filter's
    schedule, loop_filter.h:69-135) on *sheared* planes: stage d touches one
    fixed column band, so the whole stage is dynamic slices + vectorized edge
    filters over the mbh band lanes."""
    D = (mbw - 1) + 2 * (mbh - 1) + 1

    # per-stage, per-band condition/limit tables (D, mbh), one vector pass
    d_idx = jnp.arange(D)[:, None]
    b_idx = jnp.arange(mbh)[None, :]
    mbx = d_idx - 2 * b_idx
    act = (mbx >= 0) & (mbx < mbw)
    mbn = b_idx * mbw + jnp.clip(mbx, 0, mbw - 1)
    sid = seg_of_mb[mbn]
    st_active = act & (levels[sid] > 0)
    st_has_left = mbx > 0
    st_has_top = jnp.broadcast_to(b_idx > 0, (D, mbh))
    st_inner = inner_mask[mbn]
    st_mbe, st_sbe = mbe[sid], sbe[sid]
    st_int, st_hev = intr[sid], hev[sid]

    totc_y = 36 + 16 * D + 20
    totc_c = 20 + 8 * D + 12
    Sy = _shear(ry, 16, mbw, mbh, totc_y)
    Su = _shear(ru, 8, mbw, mbh, totc_c)
    Sv = _shear(rv, 8, mbw, mbh, totc_c)

    def step(d, st):
        Sy, Suv = st
        row = lambda t: jax.lax.dynamic_slice_in_dim(t, d, 1, 0)[0]
        active = row(st_active)
        has_left = row(st_has_left)
        has_top = row(st_has_top)
        inner = row(st_inner)
        l_mbe = row(st_mbe)[:, None]
        l_sbe = row(st_sbe)[:, None]
        l_int = row(st_int)[:, None]
        l_hev = row(st_hev)[:, None]

        def do(S, msize):
            """S: (P, mbh, msize, totc) — P planes filtered as one batch
            (P=1 luma, P=2 U+V: identical schedule and limits)."""
            P = S.shape[0]
            S5 = msize + 4
            C = (2 * msize + 4) + msize * d
            own = jax.lax.dynamic_slice(
                S, (0, 0, 0, C - 4), (P, mbh, msize, S5))
            tops = jax.lax.dynamic_slice(
                S, (0, 0, msize - 4, C - 4 - 2 * msize), (P, mbh, 4, S5))
            top_sh = jnp.concatenate(
                [jnp.zeros((P, 1, 4, S5), S.dtype), tops[:, :-1]], axis=1)
            win = jnp.concatenate([top_sh, own], axis=2) \
                .reshape(P * mbh, S5, S5)
            t2 = lambda a: jnp.tile(a, (P, 1))
            win = _filter_window(win, t2(l_mbe), t2(l_sbe), t2(l_int),
                                 t2(l_hev), jnp.tile(has_left, P),
                                 jnp.tile(has_top, P), jnp.tile(inner, P),
                                 jnp.tile(active, P), msize)
            # XLA:CPU miscompiles the fusion of the edge-filter chain into
            # the dynamic_update_slice consumers (off-by-one pixels vs the
            # same graph run eagerly or on TPU; verified jax 0.9.0).  The
            # barrier keeps the filtered window materialized before the
            # updates; it is fusion-neutral on TPU.
            win = jax.lax.optimization_barrier(win)
            win = win.reshape(P, mbh, S5, S5)
            S = jax.lax.dynamic_update_slice(S, win[:, :, 4:, :],
                                             (0, 0, 0, C - 4))
            # write filtered top-halo rows back into the band above (its
            # rows msize-3..msize-1); last band's slot keeps current content
            keep = jax.lax.dynamic_slice(
                S, (0, mbh - 1, msize - 3, C - 4 - 2 * msize), (P, 1, 3, S5))
            wt = jnp.concatenate([win[:, 1:, 1:4, :], keep], axis=1)
            return jax.lax.dynamic_update_slice(
                S, wt, (0, 0, msize - 3, C - 4 - 2 * msize))

        return do(Sy, 16), do(Suv, 8)

    Sy, Suv = jax.lax.fori_loop(0, D, step, (Sy[None], jnp.stack([Su, Sv])))
    return (_unshear(Sy[0], 16, mbw, mbh), _unshear(Suv[0], 8, mbw, mbh),
            _unshear(Suv[1], 8, mbw, mbh))


@lru_cache(maxsize=8)
def _cachehook_build_loopfilter_kernel(mbw: int, mbh: int):
    @jax.jit
    def kernel(ry, ru, rv, seg_of_mb, inner_mask, levels, mbe, sbe, intr,
               hev):
        return filter_planes(ry, ru, rv, seg_of_mb, inner_mask, levels, mbe,
                             sbe, intr, hev, mbw, mbh)

    return kernel


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
    (check_SSIM, /root/reference/src/vp8enc.cpp:260-261).

    The filtered planes double as the next frame's LAST reference, so the
    per-reference search state (5-level padded pyramid + padded chroma,
    ops/inter.py:build_ref_state_kernel) is built in the SAME program —
    one device dispatch chain per frame instead of two executables with a
    layout boundary between them."""
    from vp8oclenc_tpu.ops.inter import (PAD_C_FULL, PAD_Y_FULL, _pad_tiles,
                                         build_phase_tables, downsample2)

    @jax.jit
    def kernel(ry, ru, rv, levels_pack, meta, cur_ssim, lf):
        seg_ids = meta[:, 0]
        parts = meta[:, 1]
        a = jnp.abs(levels_pack.astype(jnp.int32))
        nzc = (a[:, :16, 1:].sum(axis=(1, 2)) + a[:, 16:24].sum(axis=(1, 2))
               + a[:, :16, 0].sum(axis=1) + a[:, 24].sum(axis=1))
        inner = (parts != 0) | (nzc != 0)      # ARE16X16 == 0
        from vp8oclenc_tpu.ssim_fx import WEAKEN_FX
        weaken = jnp.min(cur_ssim) > WEAKEN_FX     # cur_ssim is int32 Q15
        lf_use = jnp.where(weaken, lf[1], lf[0])
        fy, fu, fv = filter_planes(ry, ru, rv, seg_ids, inner,
                                   lf_use[0], lf_use[1], lf_use[2],
                                   lf_use[3], lf_use[4], mbw, mbh)
        pyr = []
        plane, pad = fy, PAD_Y_FULL
        for lvl in range(5):
            pyr.append(_pad_tiles(plane, pad, pad))
            if lvl < 4:
                plane = downsample2(plane)
                pad //= 2
        tbls = tuple(build_phase_tables(pyr[lvl][None]) for lvl in range(3))
        return ((fy, fu, fv),
                (tuple(pyr), tbls, _pad_tiles(fu, PAD_C_FULL, PAD_C_FULL),
                 _pad_tiles(fv, PAD_C_FULL, PAD_C_FULL)))

    return kernel


def build_loopfilter_kernel(mbw: int, mbh: int):
    from vp8oclenc_tpu.utils.jaxcache import enable
    enable()
    return _cachehook_build_loopfilter_kernel(mbw, mbh)


def build_filter_from_meta_kernel(mbw: int, mbh: int):
    from vp8oclenc_tpu.utils.jaxcache import enable
    enable()
    return _cachehook_build_filter_from_meta_kernel(mbw, mbh)
