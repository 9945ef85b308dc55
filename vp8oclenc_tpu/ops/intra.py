"""Jitted wavefront intra (keyframe) encoder — the TPU counterpart of
vp8oclenc_tpu.spec.intra.

The 4x4 B_PRED raster dependency (left, above, above-right through the
above-MB-row rule) is scheduled as an anti-diagonal wavefront d = bx + 2*by
over the global 4x4-block grid; all blocks on a diagonal are encoded in one
vectorized step (gather neighbors -> 10-mode search -> DCT/quant/iDCT ->
scatter).  Chroma TM_PRED runs a d = mbx + mby wavefront at MB granularity
with U and V batched.  Same trick the reference uses for its GPU loop filter
(/root/reference/src/loop_filter.h:69-135), applied to intra prediction.

Scratch rows/slots absorb writes from padded wavefront lanes so scatters never
collide.  Output is bit-identical to the sequential spec oracle.
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


def _luma_step(d, state, diag_by, diag_bx, y_src, w4, h4, dc_q, ac_q, W):
    recon, levels, modes = state
    by = diag_by[d]
    bx = diag_bx[d]
    valid = by >= 0
    byc = jnp.maximum(by, 0)
    bxc = jnp.maximum(bx, 0)
    Hs = h4 * 4   # scratch rows start here in the padded recon

    x = bxc * 4
    yy = byc * 4

    # --- neighbor gathers (border rules; see spec.intra.luma_block_neighbors)
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

    src = _gather4x4(y_src, yy, x).astype(jnp.int32)

    # --- mode search
    preds = bpred_all_modes(A, L, P, xp=jnp)            # (K, 10, 4, 4)
    residuals = src[:, None] - preds
    costs = T.dct_weight(residuals)                     # (K, 10)
    mode = jnp.argmin(costs, axis=1).astype(jnp.int32)
    pred = jnp.take_along_axis(preds, mode[:, None, None, None], axis=1)[:, 0]
    res = src - pred

    coeffs = T.fdct4x4(res)
    lev = T.quant4x4(coeffs, dc_q, ac_q)
    dq = T.dequant4x4(lev, dc_q, ac_q)
    rec = jnp.clip(T.idct4x4(dq) + pred, 0, 255)

    # --- scatters (invalid lanes routed to scratch)
    srow = jnp.where(valid, yy, Hs)
    rows = srow[:, None] + jnp.arange(4)[None, :]
    cols = x[:, None] + jnp.arange(4)[None, :]
    recon = recon.at[rows[:, :, None], cols[:, None, :]].set(
        rec.astype(jnp.uint8))

    mbc = (h4 // 4) * (w4 // 4)
    mb = (byc // 4) * (w4 // 4) + bxc // 4
    b = (byc % 4) * 4 + bxc % 4
    mb = jnp.where(valid, mb, mbc)
    levels = levels.at[mb, b].set(T.zigzag(lev).astype(jnp.int16))
    modes = modes.at[mb, b].set(mode.astype(jnp.int8))
    return recon, levels, modes


def _chroma_step(d, state, diag_by, diag_bx, uv_src, mbw, mbh, dc_q, ac_q):
    recon, levels = state       # recon (2, H2+8, W2); levels (2, mbc+1, 4, 16)
    mby = diag_by[d]
    mbx = diag_bx[d]
    valid = mby >= 0
    byc = jnp.maximum(mby, 0)
    bxc = jnp.maximum(mbx, 0)
    H2 = mbh * 8
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

    rows = yy[:, None] + jnp.arange(8)[None, :]
    cols = x[:, None] + jnp.arange(8)[None, :]
    src = uv_src[:, rows[:, :, None], cols[:, None, :]].astype(jnp.int32)

    pred = tm_predict_8x8(top, left, tl, xp=jnp)        # (2, K, 8, 8)
    res = src - pred
    blocks = res.reshape(2, -1, 2, 4, 2, 4).transpose(0, 1, 2, 4, 3, 5)
    lev = T.quant4x4(T.fdct4x4(blocks), dc_q, ac_q)
    dq = T.dequant4x4(lev, dc_q, ac_q)
    rr = T.idct4x4(dq)
    pred_b = pred.reshape(2, -1, 2, 4, 2, 4).transpose(0, 1, 2, 4, 3, 5)
    rec = jnp.clip(rr + pred_b, 0, 255)
    rec88 = rec.transpose(0, 1, 2, 4, 3, 5).reshape(2, -1, 8, 8)

    srow = jnp.where(valid, yy, H2)
    rows = srow[:, None] + jnp.arange(8)[None, :]
    recon = recon.at[:, rows[:, :, None], cols[:, None, :]].set(
        rec88.astype(jnp.uint8))

    mbc = mbw * mbh
    mb = jnp.where(valid, byc * mbw + bxc, mbc)
    levels = levels.at[:, mb].set(
        T.zigzag(lev).reshape(2, -1, 4, 16).astype(jnp.int16))
    return recon, levels


@lru_cache(maxsize=8)
def _cachehook_build_intra_kernel(wrk_w: int, wrk_h: int):
    """Compile the full keyframe kernel for one working resolution."""
    w4, h4 = wrk_w // 4, wrk_h // 4
    mbw, mbh = wrk_w // 16, wrk_h // 16
    mbc = mbw * mbh
    ldiag_by, ldiag_bx = _luma_diagonals(w4, h4)
    cdiag_by, cdiag_bx = _mb_diagonals(mbw, mbh)

    # Diagonal tables are passed as jit *arguments*, not closure constants:
    # committed jax.Array constants are fetched one-by-one during MLIR
    # lowering, which is pathologically slow through the remote-TPU tunnel.

    @jax.jit
    def kernel(y, u, v, y_dc_q, y_ac_q, uv_dc_q, uv_ac_q,
               ldiag_by, ldiag_bx, cdiag_by, cdiag_bx):
        recon_y = jnp.zeros((wrk_h + 4, wrk_w), dtype=jnp.uint8)
        levels_y = jnp.zeros((mbc + 1, 16, 16), dtype=jnp.int16)
        modes = jnp.zeros((mbc + 1, 16), dtype=jnp.int8)

        def lstep(d, st):
            return _luma_step(d, st, ldiag_by, ldiag_bx, y, w4, h4,
                              y_dc_q, y_ac_q, wrk_w)

        recon_y, levels_y, modes = jax.lax.fori_loop(
            0, ldiag_by.shape[0], lstep, (recon_y, levels_y, modes))

        uv = jnp.stack([u, v])
        recon_uv = jnp.zeros((2, wrk_h // 2 + 8, wrk_w // 2), dtype=jnp.uint8)
        levels_uv = jnp.zeros((2, mbc + 1, 4, 16), dtype=jnp.int16)

        def cstep(d, st):
            return _chroma_step(d, st, cdiag_by, cdiag_bx, uv, mbw, mbh,
                                uv_dc_q, uv_ac_q)

        recon_uv, levels_uv = jax.lax.fori_loop(
            0, cdiag_by.shape[0], cstep, (recon_uv, levels_uv))

        return (recon_y[:wrk_h], recon_uv[0, :wrk_h // 2],
                recon_uv[1, :wrk_h // 2], levels_y[:mbc], levels_uv[:, :mbc],
                modes[:mbc])

    def run(y, u, v, y_dc_q, y_ac_q, uv_dc_q, uv_ac_q):
        return kernel(y, u, v, y_dc_q, y_ac_q, uv_dc_q, uv_ac_q,
                      ldiag_by, ldiag_bx, cdiag_by, cdiag_bx)

    return run


def encode_intra_frame_tpu(y: np.ndarray, u: np.ndarray, v: np.ndarray, seg):
    """Drop-in replacement for spec.intra.encode_intra_frame on the TPU path."""
    H, W = y.shape
    kern = build_intra_kernel(W, H)
    sid = 0
    ry, ru, rv, lv_y, lv_uv, modes = kern(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
        jnp.int32(int(seg.y_dc_q[sid])), jnp.int32(int(seg.y_ac_q[sid])),
        jnp.int32(int(seg.uv_dc_q[sid])), jnp.int32(int(seg.uv_ac_q[sid])))
    mbc = (H // 16) * (W // 16)
    levels = np.zeros((mbc, 25, 16), dtype=np.int16)
    levels[:, :16] = np.asarray(lv_y)
    levels[:, 16:20] = np.asarray(lv_uv[0])
    levels[:, 20:24] = np.asarray(lv_uv[1])
    return (levels, np.asarray(modes),
            (np.asarray(ry), np.asarray(ru), np.asarray(rv)))


def build_intra_kernel(wrk_w: int, wrk_h: int):
    from vp8oclenc_tpu.utils.jaxcache import enable
    enable()
    return _cachehook_build_intra_kernel(wrk_w, wrk_h)
