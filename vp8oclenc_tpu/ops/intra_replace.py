"""Batched on-device SSIM intra replacement (TPU counterpart of
spec/inter.py:_intra_replace).

The reference re-encodes SSIM-failing MBs as intra on the host, walking MBs
in raster order against the evolving reconstruction
(/root/reference/src/intra_part.h:855-1087 test_inter_on_intra, driven by
check_SSIM vp8enc.cpp:231-263).  The rebuild's re-specified controller (see
spec/inter.py:_intra_replace) predicts every trial from the FROZEN
pre-replacement reconstruction and applies a winner only when none of the
four neighbor MBs feeding its prediction also won — which makes all trials
independent and lets this module run them as one batched kernel inside the
fused inter program:

  * frozen neighbor rows/columns are extracted for every MB at once with
    strided static slices of 127/129-padded planes (no per-element gathers),
  * the in-MB 4x4 raster dependency is a 16-step statically unrolled loop
    over block positions, batched over all MBs (each step is one
    (mbc, 10)-mode search),
  * trials run at AQ -> HQ -> UQ quantizers with per-MB active masks
    mirroring the spec's early-exit semantics bit-for-bit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vp8oclenc_tpu.ops import transforms as T
from vp8oclenc_tpu.spec.predict import bpred_all_modes, tm_predict_8x8
from vp8oclenc_tpu.ssim_fx import mb_ssim_fx_16x16


def _plane_mb(plane, size: int):
    """(H, W) -> (mbc, size, size) int32 per-MB patches."""
    H, W = plane.shape
    b = plane.reshape(H // size, size, W // size, size)
    return jnp.swapaxes(b, 1, 2).reshape(-1, size, size).astype(jnp.int32)


def mb_patches_to_luma_blocks(p):
    """(mbc, 16, 16) -> (mbc, 16, 4, 4) in-MB block raster order."""
    mbc = p.shape[0]
    return p.reshape(mbc, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4) \
        .reshape(mbc, 16, 4, 4)


def mb_patches_to_chroma_blocks(p):
    """(mbc, 8, 8) -> (mbc, 4, 4, 4) in-MB block raster order."""
    mbc = p.shape[0]
    return p.reshape(mbc, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4) \
        .reshape(mbc, 4, 4, 4)


def _frozen_luma_neighbors(recon_y, mbw: int, mbh: int, above_row=None):
    """Frozen per-MB neighbor data from the pre-replacement luma recon.

    Returns (ftop (mbc, 21) int32 = [P, A(x)..A(x+19)], fleft (mbc, 16)).
    Border rules (spec.intra.luma_block_neighbors): above row -> 127, left
    col -> 129, above-left at the top -> 127; the above-right pixels of the
    MB's rightmost block column come from the row above the MB, replicated
    from the MB's last column at the frame edge — exactly what edge-padding
    the plane by 4 on the right produces.

    above_row: (W + 5,) int32 COMPLETE padded ghost row [corner, row,
    right-pad x4] above this plane's first row (the row-sharded path's ICI
    ghost row with border rules pre-applied) or None for the frame top."""
    H, W = recon_y.shape
    p = jnp.pad(recon_y, ((1, 0), (1, 4)), mode="edge").astype(jnp.int32)
    p = p.at[:, 0].set(129)
    if above_row is not None:
        return _frozen_luma_finish(p.at[0, :].set(above_row), H, W, mbw, mbh)
    p = p.at[0, :].set(127)          # after the col set: corner = 127
    return _frozen_luma_finish(p, H, W, mbw, mbh)


def _frozen_luma_finish(p, H, W, mbw, mbh):
    top_rows = p[0:H:16, :]                              # (mbh, W + 5)
    ftop = jnp.stack([top_rows[:, j::16][:, :mbw] for j in range(21)],
                     axis=-1)                            # (mbh, mbw, 21)
    left_cols = p[1:H + 1, 0::16][:, :mbw]               # (H, mbw)
    fleft = left_cols.reshape(mbh, 16, mbw).transpose(0, 2, 1)
    return ftop.reshape(-1, 21), fleft.reshape(-1, 16)


def _frozen_chroma_neighbors(recon_c, mbw: int, mbh: int, above_row=None):
    """(ctop (mbc, 8), cleft (mbc, 8), ctl (mbc,)) int32, rules per
    spec.intra.encode_chroma_mb (top 127 / left 129 / top-left 127).
    above_row as in _frozen_luma_neighbors."""
    H2, W2 = recon_c.shape
    p = jnp.pad(recon_c, ((1, 0), (1, 0)), mode="edge").astype(jnp.int32)
    p = p.at[:, 0].set(129)
    if above_row is not None:
        p = p.at[0, :].set(above_row)
    else:
        p = p.at[0, :].set(127)
    top_rows = p[0:H2:8, :]                              # (mbh, W2 + 1)
    ctop = jnp.stack([top_rows[:, 1 + k::8][:, :mbw] for k in range(8)],
                     axis=-1)                            # (mbh, mbw, 8)
    ctl = top_rows[:, 0::8][:, :mbw]                     # (mbh, mbw)
    left_cols = p[1:H2 + 1, 0::8][:, :mbw]               # (H2, mbw)
    cleft = left_cols.reshape(mbh, 8, mbw).transpose(0, 2, 1)
    return ctop.reshape(-1, 8), cleft.reshape(-1, 8), ctl.reshape(-1)


def _trial_luma(y_mb, ftop, fleft, dc_q, ac_q):
    """One whole-frame batched B_PRED trial at fixed quantizers.

    y_mb (mbc, 16, 16) int32 source patches; neighbors frozen.  Returns
    (levels (mbc, 16, 16) zigzag int32, modes (mbc, 16) int32,
    rec (mbc, 16, 16) int32).  16 statically unrolled steps carry the in-MB
    raster dependency; every neighbor read is a static slice."""
    mbc = y_mb.shape[0]
    rec = jnp.zeros((mbc, 16, 16), jnp.int32)
    levels = jnp.zeros((mbc, 16, 16), jnp.int32)
    modes = jnp.zeros((mbc, 16), jnp.int32)
    for br in range(4):
        for bc in range(4):
            r0, c0 = br * 4, bc * 4
            if br == 0:
                A = ftop[:, 1 + c0: 9 + c0]
            else:
                a03 = rec[:, r0 - 1, c0:c0 + 4]
                a47 = rec[:, r0 - 1, c0 + 4:c0 + 8] if bc < 3 \
                    else ftop[:, 17:21]
                A = jnp.concatenate([a03, a47], axis=1)
            L = fleft[:, r0:r0 + 4] if bc == 0 else rec[:, r0:r0 + 4, c0 - 1]
            if br == 0:
                P = ftop[:, c0]
            elif bc == 0:
                P = fleft[:, r0 - 1]
            else:
                P = rec[:, r0 - 1, c0 - 1]
            src = y_mb[:, r0:r0 + 4, c0:c0 + 4]
            preds = bpred_all_modes(A, L, P, xp=jnp)     # (mbc, 10, 4, 4)
            costs = T.dct_weight(src[:, None] - preds)   # (mbc, 10)
            mode = jnp.argmin(costs, axis=1).astype(jnp.int32)
            pred = jnp.take_along_axis(
                preds, mode[:, None, None, None], axis=1)[:, 0]
            lev = T.quant4x4(T.fdct4x4(src - pred), dc_q, ac_q)
            dq = T.dequant4x4(lev, dc_q, ac_q)
            r = jnp.clip(T.idct4x4(dq) + pred, 0, 255)
            rec = rec.at[:, r0:r0 + 4, c0:c0 + 4].set(r)
            levels = levels.at[:, br * 4 + bc].set(T.zigzag(lev))
            modes = modes.at[:, br * 4 + bc].set(mode)
    return levels, modes, rec


def _trial_chroma(c_mb, ctop, cleft, ctl, dc_q, ac_q):
    """Batched TM_PRED chroma trial: (levels (mbc, 4, 16), rec (mbc, 8, 8))."""
    mbc = c_mb.shape[0]
    pred = tm_predict_8x8(ctop, cleft, ctl, xp=jnp)      # (mbc, 8, 8)
    res = c_mb - pred
    blocks = res.reshape(mbc, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4)
    lev = T.quant4x4(T.fdct4x4(blocks), dc_q, ac_q)
    rr = T.idct4x4(T.dequant4x4(lev, dc_q, ac_q))
    pred_b = pred.reshape(mbc, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4)
    rec = jnp.clip(rr + pred_b, 0, 255)
    rec88 = rec.transpose(0, 1, 3, 2, 4).reshape(mbc, 8, 8)
    return T.zigzag(lev).reshape(mbc, 4, 16), rec88


def intra_replace_device(y, u, v, recon_y, recon_u, recon_v, cur_ssim,
                         seg_y_dc, seg_y_ac, seg_uv_dc, seg_uv_ac,
                         ssim_target, mbw: int, mbh: int, shard=None):
    """Run the full batched controller.  Inputs are whole frozen planes and
    the per-MB Q15 SSIM after the segment loop.  Returns
    (applied (mbc,) bool, sid (mbc,), modes (mbc, 16) i32,
     lv_y (mbc, 16, 16), lv_u/lv_v (mbc, 4, 16),
     rec_y (mbc, 16, 16), rec_u/rec_v (mbc, 8, 8), new_cur (mbc,)).

    shard: None, or (axis_name, ntile) when the planes are one row shard of
    a taller frame inside shard_map.  The frozen-recon design needs only
    ONE ghost recon row from the shard above (per plane) plus that shard's
    last-MB-row winner flags for the suppression pass — two tiny ICI
    ppermutes; everything else is shard-local."""
    mbc = mbw * mbh
    above_y = above_u = above_v = None
    if shard is not None:
        axis, ntile = shard
        idx = jax.lax.axis_index(axis)
        down = [(t, t + 1) for t in range(ntile - 1)]
        is_top = (idx == 0)

        def ghost(plane, rpad):
            """Complete padded ghost row: [corner, vals, edge-pad x rpad];
            the frame-top shard reproduces the all-127 rule row exactly."""
            g = jax.lax.ppermute(plane[-1:].astype(jnp.int32), axis, down)[0]
            vals = jnp.where(is_top, 127, g)
            corner = jnp.where(is_top, 127, 129)[None]
            tail = jnp.broadcast_to(vals[-1], (rpad,)) if rpad else \
                jnp.zeros((0,), jnp.int32)
            return jnp.concatenate([corner, vals, tail])

        above_y = ghost(recon_y, 4)
        above_u = ghost(recon_u, 0)
        above_v = ghost(recon_v, 0)
    ftop, fleft = _frozen_luma_neighbors(recon_y, mbw, mbh, above_y)
    utop, uleft, utl = _frozen_chroma_neighbors(recon_u, mbw, mbh, above_u)
    vtop, vleft, vtl = _frozen_chroma_neighbors(recon_v, mbw, mbh, above_v)
    y_mb = _plane_mb(y, 16)
    u_mb = _plane_mb(u, 8)
    v_mb = _plane_mb(v, 8)

    cur = cur_ssim
    win = jnp.zeros((mbc,), bool)
    best_sid = jnp.zeros((mbc,), jnp.int32)
    best_modes = jnp.zeros((mbc, 16), jnp.int32)
    best_lv_y = jnp.zeros((mbc, 16, 16), jnp.int32)
    best_lv_u = jnp.zeros((mbc, 4, 16), jnp.int32)
    best_lv_v = jnp.zeros((mbc, 4, 16), jnp.int32)
    best_ry = jnp.zeros((mbc, 16, 16), jnp.int32)
    best_ru = jnp.zeros((mbc, 8, 8), jnp.int32)
    best_rv = jnp.zeros((mbc, 8, 8), jnp.int32)

    from vp8oclenc_tpu.ops import pallas_kernels as PK
    pmode = PK.mode()
    if pmode != "off":
        from vp8oclenc_tpu.ops.pallas_intra import trial_luma as _tl
        luma_trial = lambda *a: _tl(*a, interpret=(pmode == "interpret"))
    else:
        luma_trial = _trial_luma

    for sid in (2, 1, 0):        # AQ -> HQ -> UQ (vp8enc.cpp:242-251)
        active = cur <= ssim_target
        lv_y, md, ry_t = luma_trial(y_mb, ftop, fleft,
                                    seg_y_dc[sid], seg_y_ac[sid])
        lv_u, ru_t = _trial_chroma(u_mb, utop, uleft, utl,
                                   seg_uv_dc[sid], seg_uv_ac[sid])
        lv_v, rv_t = _trial_chroma(v_mb, vtop, vleft, vtl,
                                   seg_uv_dc[sid], seg_uv_ac[sid])
        test = mb_ssim_fx_16x16(y_mb, ry_t, u_mb, ru_t, v_mb, rv_t, xp=jnp)
        better = active & (test > cur)
        cur = jnp.where(better, test, cur)
        win = win | better
        b1 = better[:, None]
        b2 = better[:, None, None]
        best_sid = jnp.where(better, sid, best_sid)
        best_modes = jnp.where(b1, md, best_modes)
        best_lv_y = jnp.where(b2, lv_y, best_lv_y)
        best_lv_u = jnp.where(b2, lv_u, best_lv_u)
        best_lv_v = jnp.where(b2, lv_v, best_lv_v)
        best_ry = jnp.where(b2, ry_t, best_ry)
        best_ru = jnp.where(b2, ru_t, best_ru)
        best_rv = jnp.where(b2, rv_t, best_rv)

    # suppression: a winner is applied only when none of the 4 neighbor MBs
    # feeding its prediction (left, above-left, above, above-right) also won
    w2 = win.reshape(mbh, mbw)
    if shard is not None:
        gw = jax.lax.ppermute(w2[-1:], axis, down)[0]
        top_win = jnp.where(is_top, False, gw)[None]     # (1, mbw)
    else:
        top_win = jnp.zeros((1, mbw), bool)
    pw = jnp.pad(jnp.concatenate([top_win, w2], axis=0), ((0, 0), (1, 1)))
    conflict = (pw[1:, :-2] | pw[:-1, :-2] | pw[:-1, 1:-1] | pw[:-1, 2:])
    applied = win & ~conflict.reshape(-1)

    new_cur = jnp.where(applied, cur, cur_ssim)
    return (applied, best_sid, best_modes, best_lv_y, best_lv_u, best_lv_v,
            best_ry, best_ru, best_rv, new_cur)
