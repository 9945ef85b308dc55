"""Pallas TPU wavefront kernels for the keyframe (intra) reconstruction.

The XLA sheared wavefront (ops/intra.py) runs D = (w4-1) + 2*(h4-1) + 1
sequential fori_loop steps — 1022 at 1080p — each a pile of small XLA ops
whose fixed dispatch overhead dominates: ~118 ms per keyframe.  Here the
whole wavefront is ONE Pallas kernel with grid (D,): bands live on the
LANE axis, the per-step column window lives in a small VMEM ring scratch,
and each step is a few thousand VPU register ops — no HBM traffic except
streaming the source slab in and the recon slab out.

Layout (luma): band b = 4-pixel-row group, sheared right by 8*b columns.
At step d all bands process their 4x4 block at sheared column
c = 4*d (block bx = d - 2*b).  The scratch window holds the last WIN
columns of every band's 4 rows as (4, WIN, LN) i32; band-above reads are
lane rolls (+1 lane = one band up, +m+1 for the above-MB-row rule).  The
mode search evaluates all 10 B_PRED predictors (RFC 6386 §12.2, ported
from spec/predict.py) and the separable exact-integer cost
C4 @ X @ C4^T (tables.COST_M16 == kron(C4, C4)), then fdct/quant/
dequant/idct (transforms.py ports) — all in int32, bit-identical to the
XLA wavefront (tests/test_pallas_intra.py).

Reference analog: the OpenCL encoder walks the same dependency as a
per-MB loop (/root/reference/src/intra_part.h:517-741); the wavefront
schedule itself mirrors its GPU loop filter (loop_filter.h:69-135).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vp8oclenc_tpu.tables import (COSPI8SQRT2MINUS1, COST_SHIFT,
                                  SINPI8SQRT2, ZIGZAG)

# tables.COST_C — the kron factor of COST_M16 (cost = |C4 X C4^T|·w >> 9)
_C4 = ((8, 8, 8, 8), (10, 4, -4, -10), (8, -8, -8, 8), (4, -10, 10, -4))

_WIN = 40          # >= 29-column lookback (edge3 at class m=3) + 4 write
_CUR = 36          # window position of the step's column c


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _bpred10(A, L, P):
    """All 10 B_PRED predictors on lane vectors: A = list of 8 (LN,) i32,
    L = list of 4, P (LN,).  Returns list of 10 preds, each a 4x4 python
    grid of (LN,) vectors.  Exact port of spec/predict.py:bpred_all_modes
    (which matches intra_part.h:252-515)."""
    A0, A1, A2, A3, A4, A5, A6, A7 = A
    L0, L1, L2, L3 = L

    dc = (A0 + A1 + A2 + A3 + L0 + L1 + L2 + L3 + 4) >> 3
    m_dc = [[dc] * 4 for _ in range(4)]

    m_tm = [[jnp.clip(A[j] + L[i] - P, 0, 255) for j in range(4)]
            for i in range(4)]

    v = [_avg3(P, A0, A1), _avg3(A0, A1, A2), _avg3(A1, A2, A3),
         _avg3(A2, A3, A4)]
    m_ve = [v[:] for _ in range(4)]

    h = [_avg3(P, L0, L1), _avg3(L0, L1, L2), _avg3(L1, L2, L3),
         _avg3(L2, L3, L3)]
    m_he = [[h[i]] * 4 for i in range(4)]

    f = [_avg3(A0, A1, A2), _avg3(A1, A2, A3), _avg3(A2, A3, A4),
         _avg3(A3, A4, A5), _avg3(A4, A5, A6), _avg3(A5, A6, A7),
         _avg3(A6, A7, A7)]
    m_ld = [[f[r + c] for c in range(4)] for r in range(4)]

    e = {-3: _avg3(A1, A2, A3), -2: _avg3(A0, A1, A2), -1: _avg3(P, A0, A1),
         0: _avg3(L0, P, A0), 1: _avg3(L1, L0, P), 2: _avg3(L2, L1, L0),
         3: _avg3(L3, L2, L1)}
    m_rd = [[e[r - c] for c in range(4)] for r in range(4)]

    vr_c = _avg3(L2, L1, L0)
    vr_b = _avg3(L1, L0, P)
    vr_a = _avg3(L0, P, A0)
    vr = [_avg2(P, A0), _avg3(P, A0, A1), _avg2(A0, A1), _avg3(A0, A1, A2),
          _avg2(A1, A2), _avg3(A1, A2, A3), _avg2(A2, A3)]
    m_vr = [[vr[0], vr[2], vr[4], vr[6]], [vr_a, vr[1], vr[3], vr[5]],
            [vr_b, vr[0], vr[2], vr[4]], [vr_c, vr_a, vr[1], vr[3]]]

    vl = [_avg2(A0, A1), _avg3(A0, A1, A2), _avg2(A1, A2), _avg3(A1, A2, A3),
          _avg2(A2, A3), _avg3(A2, A3, A4), _avg2(A3, A4), _avg3(A3, A4, A5),
          _avg3(A4, A5, A6), _avg3(A5, A6, A7)]
    m_vl = [[vl[0], vl[2], vl[4], vl[6]], [vl[1], vl[3], vl[5], vl[7]],
            [vl[2], vl[4], vl[6], vl[8]], [vl[3], vl[5], vl[7], vl[9]]]

    hd = [_avg2(L0, P), _avg3(L0, P, A0), _avg3(P, A0, A1), _avg3(A0, A1, A2),
          _avg2(L1, L0), _avg3(L1, L0, P), _avg2(L2, L1), _avg3(L2, L1, L0),
          _avg2(L3, L2), _avg3(L3, L2, L1)]
    m_hd = [[hd[0], hd[1], hd[2], hd[3]], [hd[4], hd[5], hd[0], hd[1]],
            [hd[6], hd[7], hd[4], hd[5]], [hd[8], hd[9], hd[6], hd[7]]]

    hu = [_avg2(L0, L1), _avg3(L0, L1, L2), _avg2(L1, L2), _avg3(L1, L2, L3),
          _avg2(L2, L3), _avg3(L2, L3, L3)]
    m_hu = [[hu[0], hu[1], hu[2], hu[3]], [hu[2], hu[3], hu[4], hu[5]],
            [hu[4], hu[5], L3, L3], [L3, L3, L3, L3]]

    return [m_dc, m_tm, m_ve, m_he, m_ld, m_rd, m_vr, m_vl, m_hd, m_hu]


def _c4_pass_rows(X):
    """X: 4x4 grid of vectors -> C4 @ X (rows transformed)."""
    return [[sum(_C4[j][r] * X[r][c] for r in range(4)) for c in range(4)]
            for j in range(4)]


def _c4_pass_cols(X):
    """X -> X @ C4^T (cols transformed)."""
    return [[sum(_C4[j][c] * X[r][c] for c in range(4)) for j in range(4)]
            for r in range(4)]


def _dct_weight_vec(res):
    """Exact dct_weight (transforms.dct_cost) of a 4x4 grid of (LN,) int32
    residual vectors: sum |C4 X C4^T| * w >> COST_SHIFT, w = 1 at (0,0)
    else 4."""
    c = _c4_pass_cols(_c4_pass_rows(res))
    total = None
    for r in range(4):
        for j in range(4):
            a = jnp.abs(c[r][j])
            a = a if (r == 0 and j == 0) else a * 4
            total = a if total is None else total + a
    return total >> COST_SHIFT


def _fdct4(res):
    """transforms.fdct4x4 on a 4x4 grid of (LN,) i32 -> coeff grid [r][c]."""
    t = []
    for r in range(4):
        x = res[r]
        a1 = (x[0] + x[3]) << 3
        b1 = (x[1] + x[2]) << 3
        c1 = (x[1] - x[2]) << 3
        d1 = (x[0] - x[3]) << 3
        t.append([a1 + b1, (c1 * 2217 + d1 * 5352 + 14500) >> 12,
                  a1 - b1, (d1 * 2217 - c1 * 5352 + 7500) >> 12])
    out = [[None] * 4 for _ in range(4)]
    for c in range(4):
        a1 = t[0][c] + t[3][c]
        b1 = t[1][c] + t[2][c]
        c1 = t[1][c] - t[2][c]
        d1 = t[0][c] - t[3][c]
        out[0][c] = (a1 + b1 + 7) >> 4
        out[1][c] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) \
            + (d1 != 0).astype(jnp.int32)
        out[2][c] = (a1 - b1 + 7) >> 4
        out[3][c] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return out


def _quant_dequant4(coeffs, dc_q, ac_q):
    """transforms.quant4x4 + dequant4x4 grids (q values are (LN,)-broadcast
    scalars).  Returns (levels grid, dequantized grid)."""
    lv = [[None] * 4 for _ in range(4)]
    dq = [[None] * 4 for _ in range(4)]
    for r in range(4):
        for c in range(4):
            q = dc_q if (r == 0 and c == 0) else ac_q
            x = coeffs[r][c]
            a = x + jnp.where(x < 0, -(q // 2), q // 2)
            lev = jnp.where(a < 0, -((-a) // q), a // q)
            lv[r][c] = lev
            dq[r][c] = lev * q
    return lv, dq


def _idct4(dq):
    """transforms.idct4x4 on a 4x4 grid."""
    t = [[None] * 4 for _ in range(4)]
    for c in range(4):
        ip0, ip1, ip2, ip3 = (dq[r][c] for r in range(4))
        a1 = ip0 + ip2
        b1 = ip0 - ip2
        c1 = ((ip1 * SINPI8SQRT2) >> 16) \
            - (ip3 + ((ip3 * COSPI8SQRT2MINUS1) >> 16))
        d1 = (ip1 + ((ip1 * COSPI8SQRT2MINUS1) >> 16)) \
            + ((ip3 * SINPI8SQRT2) >> 16)
        t[0][c] = a1 + d1
        t[1][c] = b1 + c1
        t[2][c] = b1 - c1
        t[3][c] = a1 - d1
    out = [[None] * 4 for _ in range(4)]
    for r in range(4):
        x0, x1, x2, x3 = t[r]
        a1 = x0 + x2
        b1 = x0 - x2
        c1 = ((x1 * SINPI8SQRT2) >> 16) \
            - (x3 + ((x3 * COSPI8SQRT2MINUS1) >> 16))
        d1 = (x1 + ((x1 * COSPI8SQRT2MINUS1) >> 16)) \
            + ((x3 * SINPI8SQRT2) >> 16)
        out[r][0] = (a1 + d1 + 4) >> 3
        out[r][1] = (b1 + c1 + 4) >> 3
        out[r][2] = (b1 - c1 + 4) >> 3
        out[r][3] = (a1 - d1 + 4) >> 3
    return out


def _lanes(n):
    return max(128, -(-n // 128) * 128)


@lru_cache(maxsize=8)
def _build_luma_call(w4: int, h4: int, interpret: bool):
    D = (w4 - 1) + 2 * (h4 - 1) + 1
    LN = _lanes(h4)

    def kernel(dcq_ref, acq_ref, src_ref, out_ref, aux_ref, win_ref):
        d = pl.program_id(0)

        @pl.when(d == 0)
        def _init():
            win_ref[:] = jnp.zeros((4, _WIN, LN), jnp.int32)

        # slide the window left by 4 columns; writes land at 36..39
        w = pltpu.roll(win_ref[:], _WIN - 4, axis=1)

        b = jax.lax.broadcasted_iota(jnp.int32, (LN,), 0)   # band index
        bx = d - 2 * b
        band0 = b == 0
        mbtop0 = b < 4
        is3 = (bx % 4) == 3
        bx0 = bx == 0
        last = bx == (w4 - 1)

        dc_q = dcq_ref[0, 0]
        ac_q = acq_ref[0, 0]

        row3 = w[3]                                        # (WIN, LN)
        t1 = pltpu.roll(row3, 1, axis=1)                   # band above
        # window positions relative to c<->_CUR
        a03 = [t1[_CUR - 8 + j] for j in range(4)]
        a47 = [t1[_CUR - 4 + j] for j in range(4)]
        edge = t1[_CUR - 5]
        P = t1[_CUR - 9]
        # above-right of an MB's rightmost block column: row above the
        # whole MB = band b - (b%4) - 1 (spec above-MB-row rule)
        a47_3 = [jnp.zeros((LN,), jnp.int32) for _ in range(4)]
        edge3 = jnp.zeros((LN,), jnp.int32)
        for m in range(4):
            tm = pltpu.roll(row3, m + 1, axis=1)
            msk = (b % 4) == m
            for j in range(4):
                a47_3[j] = jnp.where(msk, tm[_CUR - 4 - 8 * m + j], a47_3[j])
            edge3 = jnp.where(msk, tm[_CUR - 5 - 8 * m], edge3)
        a47f = [jnp.where(is3, a47_3[j], a47[j]) for j in range(4)]
        er = jnp.where(is3, edge3, edge)
        a47f = [jnp.where(last, er, a47f[j]) for j in range(4)]
        a47f = [jnp.where(is3 & mbtop0, 127, x) for x in a47f]
        A = [jnp.where(band0, 127, x) for x in (a03 + a47f)]
        L = [jnp.where(bx0, 129, w[r, _CUR - 1]) for r in range(4)]
        P = jnp.where(band0, 127, jnp.where(bx0, 129, P))

        src = [[src_ref[0, r, c] for c in range(4)] for r in range(4)]

        preds = _bpred10(A, L, P)
        best_cost = None
        best_mode = jnp.zeros((LN,), jnp.int32)
        for m in range(10):
            res = [[src[r][c] - preds[m][r][c] for c in range(4)]
                   for r in range(4)]
            cost = _dct_weight_vec(res)
            if best_cost is None:
                best_cost = cost
            else:
                better = cost < best_cost
                best_cost = jnp.where(better, cost, best_cost)
                best_mode = jnp.where(better, m, best_mode)
        pred = [[preds[0][r][c] for c in range(4)] for r in range(4)]
        for m in range(1, 10):
            hit = best_mode == m
            for r in range(4):
                for c in range(4):
                    pred[r][c] = jnp.where(hit, preds[m][r][c], pred[r][c])

        res = [[src[r][c] - pred[r][c] for c in range(4)] for r in range(4)]
        lv, dq = _quant_dequant4(_fdct4(res), dc_q, ac_q)
        rr = _idct4(dq)
        rec = [[jnp.clip(rr[r][c] + pred[r][c], 0, 255) for c in range(4)]
               for r in range(4)]

        # write recon into the window (cols 36..39) and to the out slab;
        # out-of-range lanes carry garbage the unshear discards.  (Ref
        # slice-stores, not value .at[].set — that lowers to scatter,
        # which Mosaic has no TC lowering for.)  aux rows 0..15: levels
        # (row-major r*4+c), row 16: the chosen mode.
        stacked = jnp.stack([jnp.stack(rec[r], axis=0) for r in range(4)])
        win_ref[:] = w
        win_ref[:, _CUR:_CUR + 4] = stacked
        out_ref[0] = stacked
        aux_ref[0] = jnp.stack(
            [lv[r][c] for r in range(4) for c in range(4)]
            + [best_mode] + [jnp.zeros((LN,), jnp.int32)] * 7)

    return pl.pallas_call(
        kernel,
        grid=(D,),
        out_shape=[jax.ShapeDtypeStruct((D, 4, 4, LN), jnp.int32),
                   jax.ShapeDtypeStruct((D, 24, LN), jnp.int32)],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, 4, LN), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 4, 4, LN), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 24, LN), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((4, _WIN, LN), jnp.int32)],
        interpret=interpret,
    ), D, LN


def _take_diag(slab, h_bands: int, wblk: int, stride: int):
    """slab (D, F, LN) per-step per-band payloads -> (h_bands*wblk, F)
    rows in (band-major, bx) raster order: block (b, x) lives at step
    d = x + stride*b, lane b.  One static-index gather."""
    D, F, LN = slab.shape
    flat = slab.transpose(0, 2, 1).reshape(D * LN, F)
    b = np.arange(h_bands)[:, None]
    x = np.arange(wblk)[None, :]
    idx = ((x + stride * b) * LN + b).reshape(-1)
    return jnp.take(flat, jnp.asarray(idx), axis=0)


def luma_wavefront(y, w4: int, h4: int, dc_q, ac_q, interpret: bool = False):
    """Sequential 4x4 B_PRED reconstruction of the whole luma plane as one
    Pallas kernel.  Returns (recon (h4*4, w4*4) u8, levels_mb (mbc, 16, 16)
    i16 zigzag in in-MB raster order, modes_mb (mbc, 16) i32) —
    bit-identical to ops/intra._luma_wavefront_sheared + _luma_finalize
    (the levels/modes come straight from the loop instead of a recompute
    pass)."""
    from vp8oclenc_tpu.ops.intra import _OFF_Y, _row_shear, _row_unshear
    from vp8oclenc_tpu.ops import transforms as T
    W = w4 * 4
    call, D, LN = _build_luma_call(w4, h4, interpret)
    C = _OFF_Y + W + 8 * (h4 - 1) + 4
    Ysh = jnp.stack([_row_shear(y[r::4], 8, _OFF_Y, C) for r in range(4)],
                    axis=1)                                 # (h4, 4, C)
    need = _OFF_Y + 4 * D
    if C < need:
        Ysh = jnp.pad(Ysh, ((0, 0), (0, 0), (0, need - C)))
    slab = Ysh[:, :, _OFF_Y:_OFF_Y + 4 * D].reshape(h4, 4, D, 4) \
        .transpose(2, 1, 3, 0).astype(jnp.int32)            # (D, 4, 4, h4)
    if LN != h4:
        slab = jnp.pad(slab, ((0, 0), (0, 0), (0, 0), (0, LN - h4)))
    out, aux = call(jnp.asarray(dc_q, jnp.int32).reshape(1, 1),
                    jnp.asarray(ac_q, jnp.int32).reshape(1, 1), slab)
    rec = out[:, :, :, :h4].transpose(3, 1, 0, 2) \
        .reshape(h4, 4, 4 * D).astype(jnp.uint8)            # sheared recon
    pad_back = C - (_OFF_Y + 4 * D)
    S = jnp.pad(rec, ((0, 0), (0, 0), (_OFF_Y, max(pad_back, 0))))
    if pad_back < 0:
        S = S[:, :, :C]
    rows = [_row_unshear(S[:, r, :], 8, _OFF_Y, W) for r in range(4)]
    recon = jnp.stack(rows, axis=1).reshape(h4 * 4, W)

    blk = _take_diag(aux, h4, w4, 2)                        # (n, 24)
    from vp8oclenc_tpu.tables import ZIGZAG
    levels_z = blk[:, jnp.asarray(np.asarray(ZIGZAG))].astype(jnp.int16)
    mode = blk[:, 16].astype(jnp.int32)
    mbw = w4 // 4
    g = lambda a, tail: a.reshape(h4 // 4, 4, mbw, 4, *tail) \
        .swapaxes(1, 2).reshape((h4 // 4) * mbw, 16, *tail)
    return recon, g(levels_z, (16,)), g(mode, ())


# ---------------------------------------------------------------------------
# batched frozen-neighbor B_PRED trial (the SSIM intra-replace controller's
# luma re-encode, ops/intra_replace._trial_luma) — MBs ride the lane axis,
# the in-MB 4x4 raster is a 16-step static unroll per grid step
# ---------------------------------------------------------------------------


@lru_cache(maxsize=8)
def _build_trial_luma_call(G: int, interpret: bool):
    LN = 128

    def kernel(dcq_ref, acq_ref, src_ref, ftop_ref, fleft_ref,
               rec_out, aux_out, rec_s):
        dc_q = dcq_ref[0, 0]
        ac_q = acq_ref[0, 0]
        aux_rows = [None] * 272
        for br in range(4):
            for bc in range(4):
                r0, c0 = br * 4, bc * 4
                if br == 0:
                    A = [ftop_ref[0, 1 + c0 + j] for j in range(8)]
                else:
                    a03 = [rec_s[r0 - 1, c0 + j] for j in range(4)]
                    if bc < 3:
                        a47 = [rec_s[r0 - 1, c0 + 4 + j] for j in range(4)]
                    else:
                        a47 = [ftop_ref[0, 17 + j] for j in range(4)]
                    A = a03 + a47
                if bc == 0:
                    L = [fleft_ref[0, r0 + j] for j in range(4)]
                else:
                    L = [rec_s[r0 + j, c0 - 1] for j in range(4)]
                if br == 0:
                    P = ftop_ref[0, c0]
                elif bc == 0:
                    P = fleft_ref[0, r0 - 1]
                else:
                    P = rec_s[r0 - 1, c0 - 1]
                src = [[src_ref[0, r0 + r, c0 + c] for c in range(4)]
                       for r in range(4)]
                preds = _bpred10(A, L, P)
                best_cost = None
                best_mode = jnp.zeros((LN,), jnp.int32)
                for m in range(10):
                    res = [[src[r][c] - preds[m][r][c] for c in range(4)]
                           for r in range(4)]
                    cost = _dct_weight_vec(res)
                    if best_cost is None:
                        best_cost = cost
                    else:
                        better = cost < best_cost
                        best_cost = jnp.where(better, cost, best_cost)
                        best_mode = jnp.where(better, m, best_mode)
                pred = [[preds[0][r][c] for c in range(4)] for r in range(4)]
                for m in range(1, 10):
                    hit = best_mode == m
                    for r in range(4):
                        for c in range(4):
                            pred[r][c] = jnp.where(hit, preds[m][r][c],
                                                   pred[r][c])
                res = [[src[r][c] - pred[r][c] for c in range(4)]
                       for r in range(4)]
                lv, dq = _quant_dequant4(_fdct4(res), dc_q, ac_q)
                rr = _idct4(dq)
                b16 = br * 4 + bc
                for r in range(4):
                    for c in range(4):
                        rec_s[r0 + r, c0 + c] = jnp.clip(
                            rr[r][c] + pred[r][c], 0, 255)
                        aux_rows[b16 * 16 + r * 4 + c] = lv[r][c]
                aux_rows[256 + b16] = best_mode
        rec_out[0] = rec_s[:]
        aux_out[0] = jnp.stack(aux_rows)

    return pl.pallas_call(
        kernel,
        grid=(G,),
        out_shape=[jax.ShapeDtypeStruct((G, 16, 16, LN), jnp.int32),
                   jax.ShapeDtypeStruct((G, 272, LN), jnp.int32)],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16, 16, LN), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, LN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, LN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 16, 16, LN), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 272, LN), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((16, 16, 128), jnp.int32)],
        interpret=interpret,
    )


def trial_luma(y_mb, ftop, fleft, dc_q, ac_q, interpret: bool = False):
    """Batched frozen-neighbor B_PRED re-encode of every MB at one
    quantizer pair.  y_mb (mbc, 16, 16) i32; ftop (mbc, 21); fleft
    (mbc, 16).  Returns (levels (mbc, 16, 16) zigzag i32, modes
    (mbc, 16) i32, rec (mbc, 16, 16) i32) — bit-identical to
    ops/intra_replace._trial_luma."""
    from vp8oclenc_tpu.tables import ZIGZAG
    mbc = y_mb.shape[0]
    LN = 128
    G = -(-mbc // LN)
    pad = G * LN - mbc
    if pad:
        y_mb = jnp.pad(y_mb, ((0, pad), (0, 0), (0, 0)))
        ftop = jnp.pad(ftop, ((0, pad), (0, 0)))
        fleft = jnp.pad(fleft, ((0, pad), (0, 0)))
    src = y_mb.reshape(G, LN, 16, 16).transpose(0, 2, 3, 1)
    ft = jnp.pad(ftop, ((0, 0), (0, 3))).reshape(G, LN, 24) \
        .transpose(0, 2, 1)
    fl = fleft.reshape(G, LN, 16).transpose(0, 2, 1)
    call = _build_trial_luma_call(G, interpret)
    rec, aux = call(jnp.asarray(dc_q, jnp.int32).reshape(1, 1),
                    jnp.asarray(ac_q, jnp.int32).reshape(1, 1),
                    src.astype(jnp.int32), ft.astype(jnp.int32),
                    fl.astype(jnp.int32))
    rec = rec.transpose(0, 3, 1, 2).reshape(G * LN, 16, 16)[:mbc]
    aux = aux.transpose(0, 2, 1).reshape(G * LN, 272)[:mbc]
    lev = aux[:, :256].reshape(mbc, 16, 16)
    lev = lev[:, :, jnp.asarray(np.asarray(ZIGZAG))]
    modes = aux[:, 256:272]
    return lev, modes, rec


# ---------------------------------------------------------------------------
# chroma TM_PRED wavefront (U and V batched on the leading axis)
# ---------------------------------------------------------------------------

_WINC = 24
_CURC = 16


@lru_cache(maxsize=8)
def _build_chroma_call(mbw: int, mbh: int, interpret: bool):
    D = mbw + mbh - 1
    LN = _lanes(mbh)

    def kernel(dcq_ref, acq_ref, src_ref, out_ref, aux_ref, win_ref):
        d = pl.program_id(0)

        @pl.when(d == 0)
        def _init():
            win_ref[:] = jnp.zeros((2, 8, _WINC, LN), jnp.int32)

        w = pltpu.roll(win_ref[:], _WINC - 8, axis=2)
        b = jax.lax.broadcasted_iota(jnp.int32, (LN,), 0)
        bx = d - b
        band0 = b == 0
        bx0 = bx == 0
        dc_q = dcq_ref[0, 0]
        ac_q = acq_ref[0, 0]

        rec_uv = []
        lev_uv = []
        for p in range(2):                                  # U then V
            row7 = w[p, 7]                                  # (WINC, LN)
            t1 = pltpu.roll(row7, 1, axis=1)
            top = [jnp.where(band0, 127, t1[_CURC - 8 + j]) for j in range(8)]
            tl = jnp.where(band0, 127,
                           jnp.where(bx0, 129, t1[_CURC - 9]))
            left = [jnp.where(bx0, 129, w[p, r, _CURC - 1]) for r in range(8)]
            src = [[src_ref[0, p, r, c] for c in range(8)] for r in range(8)]
            pred = [[jnp.clip(top[c] + left[r] - tl, 0, 255)
                     for c in range(8)] for r in range(8)]
            rec = [[None] * 8 for _ in range(8)]
            levs = []
            for qy in range(2):
                for qx in range(2):
                    res = [[src[qy * 4 + r][qx * 4 + c]
                            - pred[qy * 4 + r][qx * 4 + c]
                            for c in range(4)] for r in range(4)]
                    lv, dq = _quant_dequant4(_fdct4(res), dc_q, ac_q)
                    rr = _idct4(dq)
                    levs += [lv[r][c] for r in range(4) for c in range(4)]
                    for r in range(4):
                        for c in range(4):
                            rec[qy * 4 + r][qx * 4 + c] = jnp.clip(
                                rr[r][c] + pred[qy * 4 + r][qx * 4 + c],
                                0, 255)
            rec_uv.append(rec)
            lev_uv.append(levs)

        stacked = jnp.stack(
            [jnp.stack([jnp.stack(rec_uv[p][r], axis=0) for r in range(8)])
             for p in range(2)])                            # (2, 8, 8, LN)
        win_ref[:] = w
        win_ref[:, :, _CURC:_CURC + 8] = stacked
        out_ref[0] = stacked
        aux_ref[0] = jnp.stack([jnp.stack(lev_uv[p], axis=0)
                                for p in range(2)])         # (2, 64, LN)

    return pl.pallas_call(
        kernel,
        grid=(D,),
        out_shape=[jax.ShapeDtypeStruct((D, 2, 8, 8, LN), jnp.int32),
                   jax.ShapeDtypeStruct((D, 2, 64, LN), jnp.int32)],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, 8, 8, LN), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 2, 8, 8, LN), lambda i: (i, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 2, 64, LN), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((2, 8, _WINC, LN), jnp.int32)],
        interpret=interpret,
    ), D, LN


def chroma_wavefront(uv, mbw: int, mbh: int, dc_q, ac_q,
                     interpret: bool = False):
    """Sequential TM_PRED chroma recon (U and V batched) as one Pallas
    kernel.  Returns (recon (2, mbh*8, mbw*8) u8, levels (2, mbc, 4, 16)
    i16 zigzag) — bit-identical to ops/intra._chroma_wavefront_sheared +
    _chroma_finalize."""
    from vp8oclenc_tpu.ops.intra import _OFF_C, _row_shear, _row_unshear
    W2 = mbw * 8
    call, D, LN = _build_chroma_call(mbw, mbh, interpret)
    C = _OFF_C + W2 + 8 * (mbh - 1) + 8
    sh = lambda p: jnp.stack(
        [_row_shear(p[r::8], 8, _OFF_C, C) for r in range(8)], axis=1)
    UVsh = jnp.stack([sh(uv[0]), sh(uv[1])])                # (2, mbh, 8, C)
    need = _OFF_C + 8 * D
    if C < need:
        UVsh = jnp.pad(UVsh, ((0, 0), (0, 0), (0, 0), (0, need - C)))
    slab = UVsh[:, :, :, _OFF_C:_OFF_C + 8 * D] \
        .reshape(2, mbh, 8, D, 8).transpose(3, 0, 2, 4, 1) \
        .astype(jnp.int32)                                  # (D, 2, 8, 8, mbh)
    if LN != mbh:
        slab = jnp.pad(slab,
                       ((0, 0), (0, 0), (0, 0), (0, 0), (0, LN - mbh)))
    out, aux = call(jnp.asarray(dc_q, jnp.int32).reshape(1, 1),
                    jnp.asarray(ac_q, jnp.int32).reshape(1, 1), slab)
    rec = out[:, :, :, :, :mbh].transpose(1, 4, 2, 0, 3) \
        .reshape(2, mbh, 8, 8 * D).astype(jnp.uint8)
    pad_back = C - (_OFF_C + 8 * D)
    S = jnp.pad(rec, ((0, 0), (0, 0), (0, 0), (_OFF_C, max(pad_back, 0))))
    if pad_back < 0:
        S = S[:, :, :, :C]

    def unsh(plane_sh):
        rows = [_row_unshear(plane_sh[:, r, :], 8, _OFF_C, W2)
                for r in range(8)]
        return jnp.stack(rows, axis=1).reshape(mbh * 8, W2)

    recon = jnp.stack([unsh(S[0]), unsh(S[1])])

    from vp8oclenc_tpu.tables import ZIGZAG
    blk = _take_diag(aux.reshape(D, 128, LN), mbh, mbw, 1)  # (mbc, 128)
    lev = blk.reshape(-1, 2, 4, 16)
    lev = lev[:, :, :, jnp.asarray(np.asarray(ZIGZAG))].astype(jnp.int16)
    return recon, jnp.moveaxis(lev, 1, 0)                   # (2, mbc, 4, 16)
