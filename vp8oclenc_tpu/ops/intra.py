"""Jitted wavefront intra (keyframe) encoder — the TPU counterpart of
vp8oclenc_tpu.spec.intra.

The 4x4 B_PRED raster dependency (left, above, above-right through the
above-MB-row rule) is scheduled as an anti-diagonal wavefront d = bx + 2*by
over the global 4x4-block grid; all blocks on a diagonal are encoded in one
vectorized step.  Chroma TM_PRED runs a d = mbx + mby wavefront at MB
granularity with U and V batched.  Same trick the reference uses for its
GPU loop filter (/root/reference/src/loop_filter.h:69-135), applied to
intra prediction.

Key restructuring for TPU: the sequential loop carries ONLY the
reconstruction plane.  Because every reconstructed pixel is written exactly
once and each block's predictors read only pixels coded on earlier
diagonals, the mode decisions and coefficient levels are bit-identically
recomputable AFTER the loop from the final reconstruction — one fully
vectorized pass over all blocks.  This removes the per-stage levels/modes
scatters that dominated the loop (~0.45 of ~0.65 ms per stage at 1080p:
~700 -> ~230 ms per keyframe).  Output is bit-identical to the sequential
spec oracle (tests/test_tpu_intra.py).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from vp8oclenc_tpu.ops import transforms as T
from vp8oclenc_tpu.spec.predict import bpred_all_modes, tm_predict_8x8


def _luma_diagonals(w4: int, h4: int):
    """Static wavefront table: (D, K) arrays of by/bx per diagonal
    (sentinel -1 for unused lanes)."""
    D = (w4 - 1) + 2 * (h4 - 1) + 1
    K = max(1, min(h4, (w4 + 1) // 2))
    by = np.full((D, K), -1, dtype=np.int32)
    bx = np.full((D, K), -1, dtype=np.int32)
    for d in range(D):
        k = 0
        lo = max(0, (d - (w4 - 1) + 1) // 2)
        hi = min(h4 - 1, d // 2)
        for yy in range(lo, hi + 1):
            xx = d - 2 * yy
            if 0 <= xx < w4:
                by[d, k] = yy
                bx[d, k] = xx
                k += 1
    return by, bx


def _mb_diagonals(mbw: int, mbh: int):
    D = mbw + mbh - 1
    K = min(mbw, mbh)
    by = np.full((D, K), -1, dtype=np.int32)
    bx = np.full((D, K), -1, dtype=np.int32)
    for d in range(D):
        k = 0
        for yy in range(max(0, d - mbw + 1), min(mbh - 1, d) + 1):
            by[d, k] = yy
            bx[d, k] = d - yy
            k += 1
    return by, bx


def _gather4x4(plane, r0, c0):
    """plane (H, W); r0/c0 (K,) -> (K, 4, 4) (indices must be in range)."""
    rows = r0[:, None] + jnp.arange(4)[None, :]
    cols = c0[:, None] + jnp.arange(4)[None, :]
    return plane[rows[:, :, None], cols[:, None, :]]


def _luma_neighbors(recon, byc, bxc, w4):
    """A (8 above incl. above-right), L (4 left), P (top-left) predictors of
    luma 4x4 blocks at (byc, bxc), with the VP8 border rules
    (spec.intra.luma_block_neighbors).  recon may carry extra scratch rows
    below row h4*4; reads stay within the frame."""
    x = bxc * 4
    yy = byc * 4
    row_above = jnp.maximum(yy - 1, 0)
    a03 = recon[row_above[:, None], x[:, None] + jnp.arange(4)[None, :]]
    a03 = jnp.where((byc == 0)[:, None], 127, a03)

    mb_top = (byc // 4) * 16
    tr_row = jnp.where(bxc % 4 == 3, jnp.maximum(mb_top - 1, 0), row_above)
    tr_cols = jnp.minimum(x[:, None] + 4 + jnp.arange(4)[None, :], w4 * 4 - 1)
    a47 = recon[tr_row[:, None], tr_cols]
    # frame right edge: replicate the above-MB-row pixel at the MB's last col
    rep = recon[jnp.maximum(mb_top - 1, 0), jnp.minimum(x + 3, w4 * 4 - 1)]
    a47 = jnp.where(((bxc == w4 - 1) & (bxc % 4 == 3))[:, None],
                    rep[:, None], a47)
    # rightmost block column of a top-row MB: no above MB row -> 127
    a47 = jnp.where(((bxc % 4 == 3) & (mb_top == 0))[:, None], 127, a47)
    a47 = jnp.where((byc == 0)[:, None], 127, a47)
    A = jnp.concatenate([a03, a47], axis=1).astype(jnp.int32)

    col_left = jnp.maximum(x - 1, 0)
    L = recon[yy[:, None] + jnp.arange(4)[None, :], col_left[:, None]]
    L = jnp.where((bxc == 0)[:, None], 129, L).astype(jnp.int32)

    P = recon[row_above, col_left]
    P = jnp.where(byc == 0, 127, jnp.where(bxc == 0, 129, P)).astype(jnp.int32)
    return A, L, P


def _luma_mode_and_pred(recon, y_src, byc, bxc, w4):
    """10-mode search for blocks at (byc, bxc): (mode, pred, src)."""
    A, L, P = _luma_neighbors(recon, byc, bxc, w4)
    src = _gather4x4(y_src, byc * 4, bxc * 4).astype(jnp.int32)
    preds = bpred_all_modes(A, L, P, xp=jnp)            # (K, 10, 4, 4)
    costs = T.dct_weight(src[:, None] - preds)          # (K, 10)
    mode = jnp.argmin(costs, axis=1).astype(jnp.int32)
    pred = jnp.take_along_axis(preds, mode[:, None, None, None], axis=1)[:, 0]
    return mode, pred, src


def _luma_step(d, recon, diag_by, diag_bx, y_src, w4, h4, dc_q, ac_q):
    """One wavefront stage: reconstruct the diagonal's blocks in place.
    Only recon is carried — levels/modes are recomputed post-loop."""
    by = diag_by[d]
    bx = diag_bx[d]
    valid = by >= 0
    byc = jnp.maximum(by, 0)
    bxc = jnp.maximum(bx, 0)

    _, pred, src = _luma_mode_and_pred(recon, y_src, byc, bxc, w4)
    res = src - pred
    lev = T.quant4x4(T.fdct4x4(res), dc_q, ac_q)
    dq = T.dequant4x4(lev, dc_q, ac_q)
    rec = jnp.clip(T.idct4x4(dq) + pred, 0, 255)

    # scatter (invalid lanes routed to the scratch rows below the frame)
    srow = jnp.where(valid, byc * 4, h4 * 4)
    rows = srow[:, None] + jnp.arange(4)[None, :]
    cols = (bxc * 4)[:, None] + jnp.arange(4)[None, :]
    return recon.at[rows[:, :, None], cols[:, None, :]].set(
        rec.astype(jnp.uint8))


def _luma_finalize(recon, y_src, w4, h4, dc_q, ac_q):
    """Recompute every block's mode + zigzag levels from the FINAL
    reconstruction in one vectorized pass: each block's predictors read
    only pixels from earlier diagonals, which the loop wrote exactly once,
    so the recomputation sees the same values the sequential coder saw."""
    n = w4 * h4
    bxc = jnp.tile(jnp.arange(w4, dtype=jnp.int32), h4)
    byc = jnp.repeat(jnp.arange(h4, dtype=jnp.int32), w4)
    mode, pred, src = _luma_mode_and_pred(recon, y_src, byc, bxc, w4)
    lev = T.quant4x4(T.fdct4x4(src - pred), dc_q, ac_q)
    levels_z = T.zigzag(lev).astype(jnp.int16)          # (n, 16)
    # (h4, w4) block grid -> (mbc, 16) in-MB raster order
    mbw = w4 // 4
    g = lambda a, tail: a.reshape(h4 // 4, 4, mbw, 4, *tail) \
        .swapaxes(1, 2).reshape((h4 // 4) * mbw, 16, *tail)
    return g(levels_z, (16,)), g(mode, ())


def _chroma_neighbors(recon, byc, bxc):
    x = bxc * 8
    yy = byc * 8
    row_above = jnp.maximum(yy - 1, 0)
    col_left = jnp.maximum(x - 1, 0)
    top = recon[:, row_above[:, None], x[:, None] + jnp.arange(8)[None, :]]
    top = jnp.where((byc == 0)[None, :, None], 127, top).astype(jnp.int32)
    left = recon[:, yy[:, None] + jnp.arange(8)[None, :], col_left[:, None]]
    left = jnp.where((bxc == 0)[None, :, None], 129, left).astype(jnp.int32)
    tl = recon[:, row_above, col_left]
    tl = jnp.where(byc[None, :] == 0, 127,
                   jnp.where(bxc[None, :] == 0, 129, tl)).astype(jnp.int32)
    return top, left, tl


def _chroma_pred_res(recon, uv_src, byc, bxc):
    top, left, tl = _chroma_neighbors(recon, byc, bxc)
    rows = (byc * 8)[:, None] + jnp.arange(8)[None, :]
    cols = (bxc * 8)[:, None] + jnp.arange(8)[None, :]
    src = uv_src[:, rows[:, :, None], cols[:, None, :]].astype(jnp.int32)
    pred = tm_predict_8x8(top, left, tl, xp=jnp)        # (2, K, 8, 8)
    return pred, src, rows, cols


def _chroma_step(d, recon, diag_by, diag_bx, uv_src, mbh, dc_q, ac_q):
    mby = diag_by[d]
    mbx = diag_bx[d]
    valid = mby >= 0
    byc = jnp.maximum(mby, 0)
    bxc = jnp.maximum(mbx, 0)

    pred, src, _rows, cols = _chroma_pred_res(recon, uv_src, byc, bxc)
    res = src - pred
    blocks = res.reshape(2, -1, 2, 4, 2, 4).transpose(0, 1, 2, 4, 3, 5)
    lev = T.quant4x4(T.fdct4x4(blocks), dc_q, ac_q)
    rr = T.idct4x4(T.dequant4x4(lev, dc_q, ac_q))
    pred_b = pred.reshape(2, -1, 2, 4, 2, 4).transpose(0, 1, 2, 4, 3, 5)
    rec = jnp.clip(rr + pred_b, 0, 255)
    rec88 = rec.transpose(0, 1, 2, 4, 3, 5).reshape(2, -1, 8, 8)

    srow = jnp.where(valid, byc * 8, mbh * 8)
    rows = srow[:, None] + jnp.arange(8)[None, :]
    return recon.at[:, rows[:, :, None], cols[:, None, :]].set(
        rec88.astype(jnp.uint8))


def _chroma_finalize(recon, uv_src, mbw, mbh, dc_q, ac_q):
    bxc = jnp.tile(jnp.arange(mbw, dtype=jnp.int32), mbh)
    byc = jnp.repeat(jnp.arange(mbh, dtype=jnp.int32), mbw)
    pred, src, _r, _c = _chroma_pred_res(recon, uv_src, byc, bxc)
    res = src - pred
    blocks = res.reshape(2, -1, 2, 4, 2, 4).transpose(0, 1, 2, 4, 3, 5)
    lev = T.quant4x4(T.fdct4x4(blocks), dc_q, ac_q)
    return T.zigzag(lev).reshape(2, mbw * mbh, 4, 16).astype(jnp.int16)


def intra_body(y, u, v, y_dc_q, y_ac_q, uv_dc_q, uv_ac_q,
               ldiag_by, ldiag_bx, cdiag_by, cdiag_bx,
               wrk_w: int, wrk_h: int):
    """Traceable whole-frame keyframe encode (also used inside shard_map by
    the multichip path).  Returns (recon_y, recon_u, recon_v,
    levels_pack (mbc, 25, 16) i16, modes (mbc, 16) i8)."""
    w4, h4 = wrk_w // 4, wrk_h // 4
    mbw, mbh = wrk_w // 16, wrk_h // 16
    mbc = mbw * mbh
    recon_y = jnp.zeros((wrk_h + 4, wrk_w), dtype=jnp.uint8)

    def lstep(d, r):
        return _luma_step(d, r, ldiag_by, ldiag_bx, y, w4, h4,
                          y_dc_q, y_ac_q)

    recon_y = jax.lax.fori_loop(0, ldiag_by.shape[0], lstep, recon_y)
    levels_y, modes = _luma_finalize(recon_y, y, w4, h4, y_dc_q, y_ac_q)

    uv = jnp.stack([u, v])
    recon_uv = jnp.zeros((2, wrk_h // 2 + 8, wrk_w // 2), dtype=jnp.uint8)

    def cstep(d, r):
        return _chroma_step(d, r, cdiag_by, cdiag_bx, uv, mbh,
                            uv_dc_q, uv_ac_q)

    recon_uv = jax.lax.fori_loop(0, cdiag_by.shape[0], cstep, recon_uv)
    levels_uv = _chroma_finalize(recon_uv, uv, mbw, mbh, uv_dc_q, uv_ac_q)

    # (mbc, 25, 16) packed levels (Y 16, U 4, V 4, Y2 zero) — the same
    # layout the inter path feeds to the wire kernel, so keyframes ride
    # the identical compact device->host path
    levels_pack = jnp.concatenate(
        [levels_y, levels_uv[0], levels_uv[1],
         jnp.zeros((mbc, 1, 16), jnp.int16)], axis=1)

    return (recon_y[:wrk_h], recon_uv[0, :wrk_h // 2],
            recon_uv[1, :wrk_h // 2], levels_pack, modes.astype(jnp.int8))


@lru_cache(maxsize=8)
def _cachehook_build_intra_kernel(wrk_w: int, wrk_h: int):
    """Compile the full keyframe kernel for one working resolution."""
    w4, h4 = wrk_w // 4, wrk_h // 4
    mbw, mbh = wrk_w // 16, wrk_h // 16
    ldiag_by, ldiag_bx = _luma_diagonals(w4, h4)
    cdiag_by, cdiag_bx = _mb_diagonals(mbw, mbh)

    # Diagonal tables are passed as jit *arguments*, not closure constants:
    # committed jax.Array constants are fetched one-by-one during MLIR
    # lowering, which is pathologically slow through the remote-TPU tunnel.

    @jax.jit
    def kernel(y, u, v, y_dc_q, y_ac_q, uv_dc_q, uv_ac_q,
               ldiag_by, ldiag_bx, cdiag_by, cdiag_bx):
        return intra_body(y, u, v, y_dc_q, y_ac_q, uv_dc_q, uv_ac_q,
                          ldiag_by, ldiag_bx, cdiag_by, cdiag_bx,
                          wrk_w, wrk_h)

    def run(y, u, v, y_dc_q, y_ac_q, uv_dc_q, uv_ac_q):
        return kernel(y, u, v, y_dc_q, y_ac_q, uv_dc_q, uv_ac_q,
                      ldiag_by, ldiag_bx, cdiag_by, cdiag_bx)

    return run


def encode_intra_frame_tpu(y: np.ndarray, u: np.ndarray, v: np.ndarray, seg):
    """Drop-in replacement for spec.intra.encode_intra_frame on the TPU path."""
    H, W = y.shape
    kern = build_intra_kernel(W, H)
    sid = 0
    ry, ru, rv, levels_pack, modes = kern(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
        jnp.int32(int(seg.y_dc_q[sid])), jnp.int32(int(seg.y_ac_q[sid])),
        jnp.int32(int(seg.uv_dc_q[sid])), jnp.int32(int(seg.uv_ac_q[sid])))
    return (np.asarray(levels_pack), np.asarray(modes),
            (np.asarray(ry), np.asarray(ru), np.asarray(rv)))


def build_intra_kernel(wrk_w: int, wrk_h: int):
    from vp8oclenc_tpu.utils.jaxcache import enable
    enable()
    return _cachehook_build_intra_kernel(wrk_w, wrk_h)
