"""Hand-written Pallas TPU kernels for the encoder's hot loops.

The XLA formulations in ops/inter.py are memory-bound: the 50-candidate
full-pel cost evaluation materializes (2, 3, n, 1600) float32 candidate/cost
intermediates in HBM (~1.25 GB per 1080p frame), running the MXU at ~2% —
the reference spends the same work in one LDS-tiled OpenCL kernel
(/root/reference/src/GPU_kernels.cl:459-560).  These kernels keep every
intermediate in VMEM: per grid step a tile of blocks is loaded, candidates
are extracted+costed by constant MXU matmuls, and only the per-candidate
int32 costs (or the winning prediction) are written back.

Mosaic cannot split the lane (minor) dimension in reshapes, so every
segment reduction is itself a constant 0/1 matmul: candidate extraction and
the weighted DCT-cost operator are folded into one matrix (SMw), 16-lane
quadrant sums ride a (1600, 100) summing matmul, the >> COST_SHIFT happens
in int32 between two matmuls, and the winner's prediction is extracted by
one-hot expand/collapse matmuls.

Exactness argument (same as ops/transforms.dct_cost): patch pixels (<=255),
six-tap taps (|t|<=123) and weighted cost-matrix entries (|m*w|<=400, all
<=8 significant bits) are bfloat16-exact; every f32 accumulation is of
integer products bounded well below 2^24 (weighted quadrant sums <= 13.9M),
so each matmul result is the exact integer sum.  Bit-identity with the XLA
path is enforced by tests/test_pallas_kernels.py (interpret mode) and TPU
parity runs in tools/profile_inter_r5.py.

Activation: real TPU backend by default; VP8TPU_PALLAS=0 disables,
VP8TPU_PALLAS=interpret forces interpreter mode (CPU tests).
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from vp8oclenc_tpu.tables import COST_M16, COST_SHIFT, COST_W16

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mode() -> str:
    """'tpu' (compiled), 'interpret', or 'off' (use the XLA path)."""
    env = os.environ.get("VP8TPU_PALLAS", "").lower()
    if env in ("0", "off", "no"):
        return "off"
    if env == "interpret":
        return "interpret"
    return "tpu" if jax.default_backend() == "tpu" else "off"


def _bf16(x):
    """uint8/int ref values -> bfloat16 via int32 (Mosaic has no u8->bf16)."""
    return x.astype(jnp.int32).astype(jnp.bfloat16)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dotx(a, b):
    """f32 x f32 matmul with exact integer accumulation.  The MXU's default
    f32 path rounds inputs to one bf16 pass (8-bit mantissa) — inexact for
    the >2^8 weighted-coefficient magnitudes summed here; HIGHEST selects
    the multi-pass decomposition whose integer results are exact below
    2^24."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _row_roll(x, ry):
    """In-VMEM y-alignment of phase-table patch rows: x (G, B, 384) i32
    gathered 24-row x 16-col patches (ops/inter.phase_gather), ry (G, B)
    i32 in 0..7.  Returns x rolled so lane l holds original lane
    l + ry*16 — 3 conditional lane-rotates entirely in VMEM (the x offset
    is already resolved by the 16-phase table).

    Mosaic notes: rotates must be on 32-bit data (bf16 dynamic_rotate is
    unimplemented) and the condition's minor dim must be inserted on i32
    before comparing (i1 reshapes are unsupported).  Wrapped-around
    garbage lands at lanes >= 384 - 112 = 272 and both consumers'
    constant operators never read them (fullpel slices to 256 with last
    used row 187; qpel's FH384 is zero past row 269)."""
    for bit in (4, 2, 1):
        cond = (ry & bit)[:, :, None] != 0
        x = jnp.where(cond, pltpu.roll(x, 384 - bit * 16, axis=2), x)
    return x


def _seg_dot_u8chunks(absd_f32, seg_bf16):
    """Exact 16-lane segment sums of non-negative integer f32 values
    (< 2^24) as THREE one-pass bf16 matmuls against a 0/1 summing matrix:
    the value is split into 8-bit chunks (each bf16-exact), each chunk
    summed on the MXU (partial sums <= 16*255), and the chunks recombined
    in f32.  ~6x cheaper than a HIGHEST-precision f32 matmul of the same
    shape and exactly integer."""
    d = absd_f32.astype(jnp.int32)
    out = None
    for shift in (0, 8, 16):
        c = ((d >> shift) & 255).astype(jnp.bfloat16)
        part = _dot(c, seg_bf16)
        out = part if out is None else out + part * float(1 << shift)
    return out


# ---------------------------------------------------------------------------
# constant operators
# ---------------------------------------------------------------------------

def _m64w() -> np.ndarray:
    """(64, 64) row-major-8x8-residual -> weighted DCT-cost coefficients.

    m64[(4qy+r)*8 + 4qx + c, q*16+j] = COST_M16[j, r*4+c] * COST_W16[j]:
    the quad-splitting permutation and the per-coefficient weights folded
    into one matrix (w >= 0 so w*|c| == |w*c|).  Entry magnitudes are
    {16..400}, every one bf16-exact."""
    m = np.zeros((64, 64), dtype=np.float64)
    for q in range(4):
        qy, qx = q // 2, q % 2
        for j in range(16):
            for r in range(4):
                for c in range(4):
                    m[(4 * qy + r) * 8 + 4 * qx + c, q * 16 + j] = \
                        float(COST_M16[j, r * 4 + c]) * float(COST_W16[j])
    return m.astype(np.float32)


def _seg_sum(n_in: int, width: int) -> np.ndarray:
    """(n_in, n_in // width) 0/1 matrix summing consecutive lane groups."""
    s = np.zeros((n_in, n_in // width), dtype=np.float32)
    for k in range(n_in):
        s[k, k // width] = 1.0
    return s


@lru_cache(maxsize=2)
def _fullpel_consts():
    """SMw (256, 1600): flat 12-row x 16-stride patch (the first 256 lanes
    of a row-rolled phase-table gather) -> the 25 candidates' weighted
    DCT-cost rows (selection matrix folded with _m64w); M64w for the
    current block's side; quadrant/candidate summing matrices."""
    W2 = 16
    m64 = _m64w()
    sm = np.zeros((256, 25 * 64), dtype=np.float32)
    for dxy in range(25):
        dx, dy = (dxy % 5) - 2, (dxy // 5) - 2
        for a in range(8):
            for b in range(8):
                k = (dy + 2 + a) * W2 + (dx + 2 + b)
                sm[k, dxy * 64: (dxy + 1) * 64] += m64[a * 8 + b]
    return sm, m64, _seg_sum(1600, 16), _seg_sum(100, 4)


@lru_cache(maxsize=2)
def _qpel_consts():
    """Constant operators of the qpel kernel: six-tap H/V interpolation
    matrices (ops/inter._qpel_filter_matrices), the 25-candidate
    block-diagonal weighted cost operator, summing matrices, and the
    one-hot expand/collapse pair for winner-prediction extraction."""
    from vp8oclenc_tpu.ops.inter import _qpel_filter_matrices
    FH544, FV = _qpel_filter_matrices()
    # remap FH from the XLA fallback's 17-row x 32-stride patch layout to
    # the phase-table 24-row x 16-stride rows (384 lanes): used columns
    # are <= 13 so nothing is lost; rows past 269 (incl. roll-wrapped
    # garbage lanes >= 272) are zero
    FH = np.zeros((384, FH544.shape[1]), dtype=np.float32)
    for r in range(17):
        FH[r * 16: r * 16 + 16] = FH544[r * 32: r * 32 + 16]
    m64 = _m64w()
    bd = np.zeros((1600, 1600), dtype=np.float32)
    for c in range(25):
        bd[c * 64:(c + 1) * 64, c * 64:(c + 1) * 64] = m64
    expand = np.zeros((25, 1600), dtype=np.float32)     # cand -> its 64 lanes
    collapse = np.zeros((1600, 64), dtype=np.float32)   # lanes -> pixel slot
    for c in range(25):
        expand[c, c * 64:(c + 1) * 64] = 1.0
        for j in range(64):
            collapse[c * 64 + j, j] = 1.0
    return (FH, FV, bd, _seg_sum(1600, 16), _seg_sum(100, 4),
            expand, collapse)


# ---------------------------------------------------------------------------
# full-pel 50-candidate cost kernel
# ---------------------------------------------------------------------------

_B_FULLPEL = 128


_FP_BIG = np.int32(1 << 28)


@lru_cache(maxsize=16)
def _build_fullpel_search_call(n_pad: int, nbx: int, W: int, full_h: int,
                               penalty: bool, interpret: bool):
    """Fullpel costs + penalty/validity + earliest-minimum select fused:
    outputs per (ref, block) the winning candidate's ABSOLUTE (x, y) in
    this level's pixel units.  Candidate order [window1 0..24, window0
    0..24] with window-1 winning ties, exactly _select_first_min over the
    XLA stack.  row0 rides as a scalar input so the row-sharded search
    works too.

    Inputs are phase-table patch rows (24 rows x 16-lane stride, see
    ops/inter.phase_gather) plus per-block y%8 offsets; the row alignment
    happens in VMEM (_row_roll) instead of as HBM-round-trip XLA
    passes."""
    B = _B_FULLPEL
    sm, m64, seg16, quad4 = _fullpel_consts()
    consts_np = ((sm, jnp.bfloat16), (m64, jnp.bfloat16),
                 (seg16, jnp.bfloat16), (quad4, jnp.float32))

    def kernel(row0_ref, raw_ref, ry_ref, cur_ref, v0_ref, sm_ref, m64_ref,
               seg_ref, quad_ref, out_ref):
        i = pl.program_id(0)
        xr = raw_ref[:].astype(jnp.int32).reshape(6, B, 384)
        xr = _row_roll(xr, ry_ref[:].reshape(6, B))
        p = xr[:, :, :256].reshape(6 * B, 256).astype(jnp.bfloat16)
        x = _dot(p, sm_ref[:])                          # (6B, 1600) f32
        cm = _dot(_bf16(cur_ref[:]), m64_ref[:])        # (B, 64) f32
        cmt = jnp.tile(cm, (6, 25))
        s100 = _seg_dot_u8chunks(jnp.abs(x - cmt), seg_ref[:])
        q = (s100.astype(jnp.int32) >> COST_SHIFT).astype(jnp.float32)
        costs = _dotx(q, quad_ref[:]).astype(jnp.int32)  # (6B, 25)

        blk = i * B + jax.lax.broadcasted_iota(jnp.int32, (3 * B, 25), 0) % B
        cx = (blk % nbx) * 8
        cy = (blk // nbx) * 8
        cand = jax.lax.broadcasted_iota(jnp.int32, (3 * B, 25), 1)
        dx = cand % 5 - 2
        dy = cand // 5 - 2
        v0x = jnp.tile(v0_ref[:, :, 0].reshape(3 * B, 1), (1, 25))
        v0y = jnp.tile(v0_ref[:, :, 1].reshape(3 * B, 1), (1, 25))
        r0 = row0_ref[0, 0]

        def window(c, px, py, pen):
            inv = (px < 0) | (px > W - 8) | (py + r0 < 0) \
                | (py + r0 > full_h - 8)
            t = jnp.where(inv, _FP_BIG, c + pen)
            m = jnp.min(t, axis=-1, keepdims=True)
            idx = jnp.min(jnp.where(t == m, cand, 25), axis=-1,
                          keepdims=True)
            # one-hot sum select (Mosaic-safe lane extraction)
            hit = cand == idx
            bx = jnp.sum(jnp.where(hit, px, 0), axis=-1, keepdims=True)
            by = jnp.sum(jnp.where(hit, py, 0), axis=-1, keepdims=True)
            return m, bx, by

        pen1 = (jnp.abs(dx) + jnp.abs(dy)) * 32 if penalty else 0
        pen0 = (jnp.abs(dx - v0x) + jnp.abs(dy - v0y)) * 32 if penalty else 0
        m1, bx1, by1 = window(costs[:3 * B], cx + v0x + dx, cy + v0y + dy,
                              pen1)
        m0, bx0, by0 = window(costs[3 * B:], cx + dx, cy + dy, pen0)
        use1 = m1 <= m0                  # window 1 ordered first: wins ties
        best_x = jnp.where(use1, bx1, bx0)
        best_y = jnp.where(use1, by1, by0)
        out_ref[:] = jnp.concatenate(
            [best_x, best_y, jnp.zeros((3 * B, 126), jnp.int32)],
            axis=-1).reshape(3, B, 128)

    call = pl.pallas_call(
        kernel,
        grid=(n_pad // B,),
        out_shape=jax.ShapeDtypeStruct((3, n_pad, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 3, B, 384), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3, B), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, B, 2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 1600), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1600, 100), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((100, 25), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, B, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return call, consts_np


def fullpel_search50(raw, ry, cur64, v0, row0, nbx: int, W: int,
                     full_h: int, penalty: bool, interpret: bool = False):
    """raw (2, 3, n, 384) u8 phase-table patch rows (ops/inter.
    phase_gather at margin 2); ry (2, 3, n) i32 per-block y%8 offsets;
    cur64 (n, 64) u8; v0 (3, n, 2) i32 inherited vectors (this level's
    pel units); row0 traced i32 scalar (shard's global top row, 0
    single-chip).  Returns (best_x, best_y) (3, n) i32 absolute candidate
    positions — the earliest minimum of the 50-candidate dual-window
    search."""
    from vp8oclenc_tpu.utils.hostconst import host_const
    n = raw.shape[2]
    n_pad = -(-n // _B_FULLPEL) * _B_FULLPEL
    if n_pad != n:
        raw = jnp.pad(raw, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
        ry = jnp.pad(ry, ((0, 0), (0, 0), (0, n_pad - n)))
        cur64 = jnp.pad(cur64, ((0, n_pad - n), (0, 0)))
        v0 = jnp.pad(v0, ((0, 0), (0, n_pad - n), (0, 0)))
    call, consts_np = _build_fullpel_search_call(n_pad, nbx, W, full_h,
                                                 penalty, interpret)
    out = call(jnp.asarray(row0, jnp.int32).reshape(1, 1), raw,
               ry.astype(jnp.int32), cur64,
               v0, *(host_const(a, d) for a, d in consts_np))[:, :n]
    return out[:, :, 0], out[:, :, 1]


# ---------------------------------------------------------------------------
# quarter-pel interpolate + cost + first-min select kernel
# ---------------------------------------------------------------------------

_B_QPEL = 128          # lane dim of the offs BlockSpec must be 128-divisible
_QPEL_BIG = np.int32(1 << 28)


@lru_cache(maxsize=8)
def _build_qpel_call(n_pad: int, nbx: int, W: int, full_h: int,
                     interpret: bool):
    """Per 8x8 block: 25 qpel candidates interpolated (six-tap H then V with
    the spec clip((x+64)>>7, 0, 255) rounding between), costed,
    penalty+validity applied, earliest-minimum selected.  Outputs per
    (ref, block): best cost (penalty included), best index, and the
    winner's 64-pixel prediction.  The zero-MV candidate (#25 in the
    reference ordering, GPU_kernels.cl:1144-1150) is merged by the XLA
    caller — it comes after these 25, so it wins only on strictly smaller
    cost."""
    B = _B_QPEL
    FH, FV, bd, seg16, quad4, expand, collapse = _qpel_consts()
    consts_np = ((FH, jnp.bfloat16), (FV, jnp.bfloat16), (bd, jnp.bfloat16),
                 (seg16, jnp.bfloat16), (quad4, jnp.float32),
                 (expand, jnp.bfloat16), (collapse, jnp.bfloat16))
    def rnd(x):
        return jnp.clip(jnp.floor((x + 64.0) * (1.0 / 128.0)), 0, 255)

    def kernel(raw_ref, ry_ref, cur_ref, v0_ref, fh_ref, fv_ref, bd_ref,
               seg_ref, quad_ref, exp_ref, col_ref, out_ref):
        i = pl.program_id(0)
        xr = raw_ref[:].astype(jnp.int32)               # (3, B, 384)
        xr = _row_roll(xr, ry_ref[:])
        p = xr.reshape(3 * B, 384).astype(jnp.bfloat16)
        h = rnd(_dot(p, fh_ref[:]))                     # (3B, 680)
        v = rnd(_dot(h.astype(jnp.bfloat16), fv_ref[:]))  # (3B, 1600) preds

        cm = _dot(_bf16(cur_ref[:]), bd_ref[:64, :64])  # (B, 64) f32
        pm = _dot(v.astype(jnp.bfloat16), bd_ref[:])    # (3B, 1600)
        d = pm - jnp.tile(cm, (3, 25))
        s100 = _seg_dot_u8chunks(jnp.abs(d), seg_ref[:])  # (3B, 100)
        q = (s100.astype(jnp.int32) >> COST_SHIFT).astype(jnp.float32)
        costs = _dotx(q, quad_ref[:]).astype(jnp.int32)  # (3B, 25)

        # penalty + frame-bounds validity (qpel units); candidate tables
        # from iota (Pallas kernels cannot capture array constants)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (1, 25), 1)
        dx25 = cidx % 5 - 2
        dy25 = cidx // 5 - 2
        pen25 = (jnp.abs(dx25) + jnp.abs(dy25)) * 32
        blk = i * B + jax.lax.broadcasted_iota(jnp.int32, (B, 25), 0)
        cx = (blk % nbx) * 32
        cy = (blk // nbx) * 32
        v0x = jnp.tile(v0_ref[:, :, 0].reshape(3 * B, 1), (1, 25))
        v0y = jnp.tile(v0_ref[:, :, 1].reshape(3 * B, 1), (1, 25))
        px = jnp.tile(cx, (3, 1)) + v0x + dx25
        py = jnp.tile(cy, (3, 1)) + v0y + dy25
        invalid = (px < 0) | (px > W * 4 - 32) | (py < 0) \
            | (py > full_h * 4 - 32)
        total = jnp.where(invalid, _QPEL_BIG, costs + pen25)

        # earliest-minimum select (Mosaic argmin is float-only: use integer
        # min + smallest index among equal-min lanes — exact on int32)
        m = jnp.min(total, axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (3 * B, 25), 1)
        best = jnp.min(jnp.where(total == m, lane, 25), axis=-1)
        bcost = m[:, 0]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (3 * B, 25), 1)
                  == best[:, None]).astype(jnp.bfloat16)
        mask = _dot(onehot, exp_ref[:])                 # (3B, 1600)
        pred = _dot((v * mask).astype(jnp.bfloat16),    # winner <= 255 exact
                    col_ref[:])                         # (3B, 64) f32
        # pack (cost, idx, pred) into one 128-lane row: Mosaic requires
        # output lane dims divisible by 128 (or the full array dim)
        out_ref[:] = jnp.concatenate(
            [bcost[:, None], best[:, None],
             jnp.zeros((3 * B, 62), jnp.int32), pred.astype(jnp.int32)],
            axis=-1).reshape(3, B, 128)

    return pl.pallas_call(
        kernel,
        grid=(n_pad // B,),
        out_shape=jax.ShapeDtypeStruct((3, n_pad, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec((3, B, 384), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, B, 2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((384, 680), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((680, 1600), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1600, 1600), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1600, 100), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((100, 25), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((25, 1600), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1600, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, B, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    ), consts_np


def qpel_search25(raw, ry, cur64, v0, nbx: int, W: int, full_h: int,
                  interpret: bool = False):
    """raw (3, n, 384) u8 phase-table patch rows (ops/inter.phase_gather
    at fullpel base c + v0 - 3); ry (3, n) i32 per-block y%8 offsets;
    cur64 (n, 64) u8; v0 (3, n, 2) i32 qpel base vectors.  Returns
    (best_cost (3, n) i32 with penalty applied, best_idx (3, n),
    best_pred (3, n, 64) i32) over the 25 +-2-qpel candidates."""
    n = raw.shape[1]
    n_pad = -(-n // _B_QPEL) * _B_QPEL
    if n_pad != n:
        raw = jnp.pad(raw, ((0, 0), (0, n_pad - n), (0, 0)))
        ry = jnp.pad(ry, ((0, 0), (0, n_pad - n)))
        cur64 = jnp.pad(cur64, ((0, n_pad - n), (0, 0)))
        v0 = jnp.pad(v0, ((0, 0), (0, n_pad - n), (0, 0)))
    from vp8oclenc_tpu.utils.hostconst import host_const
    call, consts_np = _build_qpel_call(n_pad, nbx, W, full_h, interpret)
    packed = call(raw, ry.astype(jnp.int32), cur64, v0,
                  *(host_const(a, d) for a, d in consts_np))[:, :n]
    return packed[:, :, 0], packed[:, :, 1], packed[:, :, 64:]
