"""Jitted JAX inter-frame pixel pipeline — TPU counterpart of spec/inter.py.

One fused jit per working resolution covers: downsample pyramid, 5-level
hierarchical dual-window full search, quarter-pel six-tap refinement,
reference selection over a batched refs axis, 8x8->16x16 packing, whole-plane
six-tap motion-compensated prediction, the LQ->UQ progressive segment
requantization loop with per-MB SSIM, and Y2/WHT handling — the entire
reference GPU program (/root/reference/src/inter_part.h:96-384 and the
kernels it launches) as one XLA-compiled function.

TPU-native data movement: reference planes are stored with an edge-replicated
apron and (8,16)-tiled so every data-dependent patch read becomes an
embedding-style row gather of 128-byte tiles (fast path of the XLA TPU
gather) followed by static-shift selects — arbitrary per-element gathers are
~100x slower on TPU and are never used.  The refs axis is batched
(LAST/GOLDEN/ALTREF as a leading dim) instead of the reference's 3 command
queues x 15 kernel instances (init.h:204-225).  The luma motion-compensated
prediction is fused into the quarter-pel search: every candidate's
interpolated block is already computed for its cost, so the winner's
prediction is kept via masked selects and the separate whole-plane luma MC
pass (reference prepare_predictors_and_residual, GPU_kernels.cl:1285-1344)
disappears entirely.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from vp8oclenc_tpu.ops import transforms as T
from vp8oclenc_tpu.ssim_fx import UNCODED_FX, mb_ssim_fx
from vp8oclenc_tpu.tables import (ARE8X8, ARE16X16, LQ_SEGMENT,
                                  SIXTAP_FILTERS)

VECTOR_DIFF_WEIGHT = 64
# plain numpy, NOT jnp: a module-level jnp scalar commits to the device at
# import time and every trace that closes over it pays a blocking device
# fetch during MLIR lowering (through the remote tunnel: observed 70 s for
# these 4 bytes)
BIG = np.int32(1 << 28)

# max full-res excursion of any ref read: |v|<=62 fullpel (2 per level x
# pixel_rate) + search window 2 + six-tap apron 3 + qpel shift 1 < 80
PAD_Y_FULL = 80
PAD_C_FULL = 48          # chroma reads at |v|/2 + aprons < 48

_SIXTAP = np.asarray(SIXTAP_FILTERS)


# ---------------------------------------------------------------------------
# padded, tile-aligned reference planes + the tile-row patch gather
# ---------------------------------------------------------------------------

def _pad_tiles(p, pad_y: int, pad_x: int):
    """Edge-replicate pad by (pad_y, pad_x) at top/left and at least as much
    at bottom/right, rounding the padded dims up to (8, 16) tile multiples.
    Replication makes the spec oracle's per-element index clamp a no-op:
    any in-apron read returns exactly the clamped edge value."""
    H, W = p.shape[-2], p.shape[-1]
    PH = -(-(H + 2 * pad_y) // 8) * 8
    PW = -(-(W + 2 * pad_x) // 16) * 16
    cfg = ((0, 0),) * (p.ndim - 2) + ((pad_y, PH - H - pad_y),
                                      (pad_x, PW - W - pad_x))
    return jnp.pad(p, cfg, mode="edge")


def _tile_take_patch(planes, pidx, gy, gx, ph: int, pw: int,
                     as_flat: bool = False):
    """planes (K, PH, PW) u8 padded+tile-aligned; pidx/gy/gx (..., n) int32
    (gy/gx = padded-coordinate top-left).  Returns (..., n, ph, W2) u8 with
    W2 = 16*ceil((pw+15)/16): row r, col j hold plane[gy+r, gx+j] for
    j <= W2-16 (callers slice j < pw <= W2-15 and must treat W2 as the row
    stride).

    One jnp.take of whole 128B tile rows (the fast TPU gather path); the
    per-block sub-tile (row, col) offset is then resolved on the FLAT lane
    axis by a binary shift decomposition — 3 + 4 conditional lane-shift
    passes over a 128-multiple minor dim.  (The real-TPU search path uses
    build_phase_tables/phase_gather instead: x-phase-duplicated tables
    whose rows ARE whole unshifted patches, leaving only 3 in-VMEM row
    rolls to the Pallas kernels.)"""
    K, PH, PW = planes.shape
    TB, TC = PH // 8, PW // 16
    tr = -(-(ph + 7) // 8)
    tc = -(-(pw + 15) // 16)
    W2 = tc * 16
    table = planes.reshape(K, TB, 8, TC, 16).transpose(0, 1, 3, 2, 4) \
                  .reshape(K * TB * TC, 128)
    # valid iff the tile block [ty, ty+tr) x [tx, tx+tc) is in range; the
    # sub-tile offsets ry<=7 / rx<=15 always fit (8*tr >= ph+7, 16*tc >= pw+15)
    gy = jnp.clip(gy, 0, 8 * (TB - tr) + 7)
    gx = jnp.clip(gx, 0, 16 * (TC - tc) + 15)
    ty, tx = gy // 8, gx // 16
    ry, rx = gy % 8, gx % 16
    base = pidx * (TB * TC) + ty * TC + tx
    off = (jnp.arange(tr)[:, None] * TC + jnp.arange(tc)).reshape(-1)
    tid = base[..., None] + off                          # (..., n, tr*tc)
    lead = tid.shape[:-1]
    g = jnp.take(table, tid.reshape(-1), axis=0)
    g = g.reshape(*lead, tr, tc, 8, 16)
    flat = jnp.swapaxes(g, -3, -2).reshape(*lead, tr * 8 * W2)
    ry = jnp.broadcast_to(ry, lead)
    rx = jnp.broadcast_to(rx, lead)

    def shift(a, amt, cond):
        L = a.shape[-1] - amt
        lo = jax.lax.slice_in_dim(a, 0, L, axis=-1)
        hi = jax.lax.slice_in_dim(a, amt, amt + L, axis=-1)
        return jnp.where(cond[..., None], hi, lo)

    for bit in (4, 2, 1):
        flat = shift(flat, bit * W2, (ry & bit) != 0)
    for bit in (8, 4, 2, 1):
        flat = shift(flat, bit, (rx & bit) != 0)
    need = ph * W2
    if flat.shape[-1] < need:
        flat = jnp.concatenate(
            [flat, jnp.zeros(lead + (need - flat.shape[-1],), flat.dtype)],
            axis=-1)
    out = jax.lax.slice_in_dim(flat, 0, need, axis=-1)
    return out if as_flat else out.reshape(*lead, ph, W2)


# ---------------------------------------------------------------------------
# x-phase patch tables — the real-TPU search gather
# ---------------------------------------------------------------------------
#
# A candidate patch read is (y, x) -> up to 17 rows x 14 cols at arbitrary
# offset.  Instead of assembling it from (8, 16) tiles with 7 conditional
# shift passes, the reference planes are expanded into 16 x-phase copies
# whose gather rows ARE whole (24-row x 16-col) unshifted patch columns:
# row (px, y8, tx) holds plane[8*y8 : 8*y8+24, 16*tx+px : 16*tx+px+16]
# flattened row-major (384 B).  A single jnp.take then fetches each block's
# patch with the x offset already resolved; only the y%8 roll remains, done
# in VMEM by the Pallas kernels (3 conditional rolls).  Memory cost: 48x
# the plane per ref level (16 phases x 3-row overlap), ~0.5 GB total at
# 1080p -- bought back many times over by the gather running at take()'s
# full bandwidth with zero post-passes.  The reference stages the same
# read through LDS per workgroup (GPU_kernels.cl:459-560).

PHASE_ROWS = 24          # 3 vertically-overlapping 8-row tile rows
PHASE_LANES = PHASE_ROWS * 16


def build_phase_tables(ref_pad):
    """ref_pad (R, PH, PW) u8 padded tile-aligned reference planes ->
    (R*16*(TB+2)*TC, 128) u8 phase table: row (r, px, ty, tx) holds the
    (8, 16) tile at plane[8*ty : 8*ty+8, 16*tx+px : 16*tx+px+16].  No
    vertical duplication — phase_gather fetches the 3 vertically-adjacent
    rows per patch (a 3x-row duplicating build costs 13 ms/frame of
    concat bandwidth at 1080p; this one is a 16-phase slice + one tile
    transpose, ~3 ms for all 3 refs)."""
    R, PH, PW = ref_pad.shape
    TB, TC = PH // 8, PW // 16
    ext = jnp.pad(ref_pad, ((0, 0), (0, 16), (0, 15)), mode="edge")
    ph = jnp.stack([ext[:, :, px:px + PW] for px in range(16)], axis=1)
    t = ph.reshape(R, 16, TB + 2, 8, TC, 16).transpose(0, 1, 2, 4, 3, 5)
    return t.reshape(R * 16 * (TB + 2) * TC, 128)


def _gather_windows(tbl3, ref_pad, TB: int, TC: int, ridx, gy, gx):
    """Gather (R, n) patch windows: from per-ref state tables when tbl3 is
    given (3-tuple, each built with R=1), else from a per-frame R-stacked
    table built from ref_pad (sharded strips / compat entries)."""
    if tbl3 is None:
        tbl = build_phase_tables(ref_pad)
        return phase_gather(tbl, TB, TC, ridx, gy, gx)
    raws, rys = [], []
    zero = jnp.zeros(gy.shape[-1:], jnp.int32)
    for r in range(len(tbl3)):
        raw_r, ry_r = phase_gather(tbl3[r], TB, TC, zero, gy[r], gx[r])
        raws.append(raw_r)
        rys.append(ry_r)
    return jnp.stack(raws), jnp.stack(rys)


def phase_gather(tbl, TB: int, TC: int, pidx, gy, gx):
    """tbl from build_phase_tables; pidx/gy/gx (..., n) i32 (gy/gx =
    padded-coordinate patch top-left).  Returns (raw (..., n, 384) u8
    patch rows starting at row gy - gy%8, col gx, and ry = gy%8 (..., n)
    i32 — the row roll the Pallas kernel applies in VMEM).  The 3
    vertically-adjacent tile rows land contiguously, so the post-take
    reshape is layout-free and raw is the 24-row x 16-col row-major
    patch."""
    gy = jnp.clip(gy, 0, 8 * (TB - 3) + 7)
    gx = jnp.clip(gx, 0, 16 * TC - 1)
    y8, ry = gy // 8, gy % 8
    tx, px = gx // 16, gx % 16
    base = ((pidx * 16 + px) * (TB + 2) + y8) * TC + tx
    tid3 = base[..., None] + jnp.arange(3) * TC          # (..., n, 3)
    lead = base.shape
    raw = jnp.take(tbl, tid3.reshape(-1), axis=0).reshape(*lead, PHASE_LANES)
    return raw, jnp.broadcast_to(ry.astype(jnp.int32), lead)


@lru_cache(maxsize=4)
def _sel25_matrix():
    """(384, 1600) 0/1 selection operator: flat 12-row x 32-stride patch ->
    the 25 search candidates' 8x8 blocks as row-major 64-vectors.

    Candidate extraction as ONE MXU matmul replaces 25 strided slices of a
    (..., 12, 32) array: those tiny minor dims get lane-padded up to 16x by
    the TPU tiler, and the repeated padded reads/writes dominated the
    full-resolution search stage (~44 ms of the 1080p inter kernel)."""
    W2 = 32
    S = np.zeros((12 * W2, 25 * 64), dtype=np.float32)
    for dxy in range(25):
        dx, dy = (dxy % 5) - 2, (dxy // 5) - 2
        for a in range(8):
            for b in range(8):
                S[(dy + 2 + a) * W2 + (dx + 2 + b), dxy * 64 + a * 8 + b] = 1.0
    return S


@lru_cache(maxsize=4)
def _qpel_filter_matrices():
    """Six-tap quarter-pel interpolation as two constant matmuls.

    FH: (544, 680) — flat 17-row x 32-stride patch -> 5 horizontal passes
        (one per dx in -2..2), each a (17, 8) grid stored flat.
    FV: (680, 1600) — the H-pass outputs -> all 25 candidates' 8x8 blocks.
    The spec-mandated clip((h+64)>>7, 0, 255) rounding between the passes
    stays as an elementwise step; each matmul accumulates exact integers in
    f32 (|products| <= 255*128, sums < 2^18)."""
    W2 = 32
    FH = np.zeros((17 * W2, 5 * 136), dtype=np.float32)
    FV = np.zeros((5 * 136, 25 * 64), dtype=np.float32)
    for di, dx in enumerate(range(-2, 3)):
        sx = (dx % 4 + 4) % 4
        ox = (dx - sx) // 4
        fx = SIXTAP_FILTERS[sx * 2]
        base = 3 + ox - 2
        for r in range(17):
            for j in range(8):
                for k in range(6):
                    if int(fx[k]):
                        FH[r * W2 + base + k + j, di * 136 + r * 8 + j] \
                            += float(fx[k])
    for cand in range(25):
        dx, dy = (cand % 5) - 2, (cand // 5) - 2
        di = dx + 2
        sy = (dy % 4 + 4) % 4
        oy = (dy - sy) // 4
        fy = SIXTAP_FILTERS[sy * 2]
        base = 3 + oy - 2
        for j in range(64):
            for k in range(6):
                if int(fy[k]):
                    FV[di * 136 + (base + k) * 8 + j, cand * 64 + j] \
                        += float(fy[k])
    return FH, FV


def _const_matmul(x_rows, mat_np):
    """(..., K) exact-integer rows @ (K, M) constant -> (..., M) f32 on the
    MXU; both operands' integers are bf16-exact so the f32 result is the
    exact integer product-sum.  The constant is host-pinned so lowering
    never round-trips it through the device (utils.hostconst)."""
    from vp8oclenc_tpu.utils.hostconst import host_const
    lead = x_rows.shape[:-1]
    flat = x_rows.reshape(-1, x_rows.shape[-1]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        flat, host_const(mat_np, "bfloat16"),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return out.reshape(*lead, mat_np.shape[1])


def _taps_select(ph):
    """(..., n) phase indices -> (..., n, 6) six-tap coefficients via static
    selects (no table gather; taps are compile-time constants)."""
    out = jnp.zeros(ph.shape + (6,), dtype=jnp.int32)
    for p in range(8):
        t = jnp.asarray(np.asarray(SIXTAP_FILTERS[p], np.int32))
        out = jnp.where((ph == p)[..., None], t, out)
    return out


# ---------------------------------------------------------------------------
# pyramid
# ---------------------------------------------------------------------------

def downsample2(p):
    """2x2 box downsample via reduce_window (the TPU's native pooling path).
    The earlier strided-slice formulation (q[..., 0::2, 0::2] + ...) lowered
    to four whole-plane custom-fusion gathers running at ~1.4 GB/s — 60 ms
    per 1080p frame across the two per-frame pyramid builds."""
    h, w = p.shape[-2] // 2, p.shape[-1] // 2
    q = p[..., : h * 2, : w * 2].astype(jnp.int32)
    lead = (1,) * (q.ndim - 2)
    s = jax.lax.reduce_window(q, 0, jax.lax.add,
                              window_dimensions=lead + (2, 2),
                              window_strides=lead + (2, 2),
                              padding="valid")
    return ((s + 2) // 4).astype(jnp.uint8)


def build_ref_pyramid(refs, H: int, W: int):
    """refs (R, H, W) u8 -> list of (padded plane, (pad_y, pad_x), (H_l, W_l))
    per level.  Each level is padded from its own interior (an apron that
    rode through the box downsample would replicate the *full-res* edge row,
    not the downsampled one, and diverge from per-element clamping)."""
    out = []
    plane = refs
    pad = PAD_Y_FULL
    h, w = H, W
    for lvl in range(5):
        out.append((_pad_tiles(plane, pad, pad), (pad, pad), (h, w)))
        if lvl < 4:
            plane = downsample2(plane)
            pad //= 2
            h, w = h // 2, w // 2
    return out


# ---------------------------------------------------------------------------
# search
# ---------------------------------------------------------------------------

def _select_first_min(cost_stack, px_stack, py_stack):
    """Earliest-minimum candidate selection (matches a strict `<` scan).
    cost_stack (C, R, n) i32; px/py (C, R, n) -> (best_x, best_y, best_cost,
    best_idx) each (R, n)."""
    best_idx = jnp.argmin(cost_stack, axis=0)          # first min wins
    take = lambda s: jnp.take_along_axis(s, best_idx[None], axis=0)[0]
    return take(px_stack), take(py_stack), take(cost_stack), best_idx


def _plane_blocks8(plane):
    H, W = plane.shape[-2], plane.shape[-1]
    nby, nbx = H // 8, W // 8
    lead = plane.shape[:-2]
    b = plane[..., : nby * 8, : nbx * 8].reshape(*lead, nby, 8, nbx, 8)
    b = jnp.moveaxis(b, -2, -3)
    return b.reshape(*lead, nby * nbx, 8, 8).astype(jnp.int32)


# below this many blocks the XLA formulation beats the Pallas kernel's
# fixed costs (phase-table build + dispatch); at 1080p levels 0-2 are above
_PALLAS_MIN_N = 1024


def search_level(cur, ref_pad, pads, src_vec, pixel_rate: int, penalty: bool,
                 row0=0, full_h: int = 0, src_off=0, tbl3=None):
    """cur (H, W) unpadded; ref_pad (R, PH, PW) padded; pads = (pad_y, pad_x).
    src_vec (R, nbyc, nbxc, 2) or None.  Returns (R, nby, nbx, 2) vectors
    in full-res pixel units.

    row0/full_h support row-sharded (tile-parallel) operation: cur is the
    shard starting at global row `row0` of a `full_h`-tall frame and ref_pad
    carries halo rows; candidate validity is checked against the FULL frame
    bounds so shard results equal the single-chip kernel's.  src_off (this
    level's px offset of the shard, traced ok) is added to cy for the
    parent-vector lookup when src_vec covers the FULL frame grid while cur
    is a shard (the replicated coarse levels of the sharded search)."""
    H, W = cur.shape
    if not full_h:
        full_h = H
    R = ref_pad.shape[0]
    py0, px0 = pads
    nbx, nby = W // 8, H // 8
    n = nbx * nby
    cx = jnp.tile(jnp.arange(nbx) * 8, nby)
    cy = jnp.repeat(jnp.arange(nby) * 8, nbx)

    if src_vec is None:
        v0 = jnp.zeros((R, n, 2), dtype=jnp.int32)
    else:
        pby = jnp.clip(((cy + src_off) // 2) // 8, 0, src_vec.shape[1] - 1)
        pbx = jnp.clip((cx // 2) // 8, 0, src_vec.shape[2] - 1)
        v = src_vec[:, pby, pbx]                       # (R, n, 2)
        v0 = jnp.sign(v) * (jnp.abs(v) // pixel_rate)
    v0x, v0y = v0[..., 0], v0[..., 1]

    cur_blocks = _plane_blocks8(cur).reshape(n, 64)

    # --- both windows' 8x8 candidate blocks from two 12x12 tile-takes:
    # window 1 = +-2 around the inherited vector, window 2 = +-2 around
    # zero (the reference's rate>8 vector reset, GPU_kernels.cl:500) ---
    ridx = jnp.broadcast_to(jnp.arange(R)[:, None], (R, n))
    from vp8oclenc_tpu.ops import pallas_kernels as PK
    pmode = PK.mode()
    zero = jnp.zeros((R, n), jnp.int32)
    if pmode != "off" and R == 3 and n >= _PALLAS_MIN_N:
        # phase-table gathers (whole unshifted patch rows); the y%8 roll +
        # extraction + cost + penalty/validity + earliest-min select all
        # happen in one VMEM-resident kernel; row0 rides as a scalar so
        # the row-sharded search uses the same kernel.  tbl3 (one table
        # per ref, built once per REFERENCE in the ref-state kernel) is
        # used when given; otherwise the table is built here per frame.
        PH, PW = ref_pad.shape[-2:]
        TB, TC = PH // 8, PW // 16
        raw1, ry1 = _gather_windows(tbl3, ref_pad, TB, TC, ridx,
                                    cy[None] + v0y + (py0 - 2),
                                    cx[None] + v0x + (px0 - 2))
        raw0, ry0 = _gather_windows(tbl3, ref_pad, TB, TC, ridx,
                                    cy[None] + zero + (py0 - 2),
                                    cx[None] + zero + (px0 - 2))
        best_x, best_y = PK.fullpel_search50(
            jnp.stack([raw1, raw0]), jnp.stack([ry1, ry0]),
            cur_blocks.astype(jnp.uint8), v0.astype(jnp.int32),
            row0, nbx, W, full_h, penalty,
            interpret=(pmode == "interpret"))
        vx = (best_x - cx[None]) * pixel_rate
        vy = (best_y - cy[None]) * pixel_rate
        return jnp.stack([vx, vy], axis=-1).reshape(R, nby, nbx, 2)

    patch1 = _tile_take_patch(ref_pad, ridx,
                              cy[None] + v0y + (py0 - 2),
                              cx[None] + v0x + (px0 - 2), 12, 12,
                              as_flat=True)
    patch0 = _tile_take_patch(ref_pad, ridx, cy[None] + zero + (py0 - 2),
                              cx[None] + zero + (px0 - 2), 12, 12,
                              as_flat=True)

    # all 50 candidates extracted + costed on the MXU (XLA fallback for
    # CPU backend / R != 3); materializes ~1.25 GB of candidate
    # intermediates in HBM per 1080p frame
    patches = jnp.stack([patch1, patch0])              # (2, R, n, 384) u8
    cand = _const_matmul(patches, _sel25_matrix())      # (2, R, n, 1600) f32
    cur_t = jnp.tile(cur_blocks.astype(jnp.bfloat16), (1, 25))
    res = (cand.astype(jnp.bfloat16) - cur_t[None, None])
    costs = T.dct_cost_rows64(res.reshape(2, R, n, 25, 64))
    costs = jnp.moveaxis(costs, 3, 1).reshape(50, R, n)  # (2, R, n, 25) in

    pxs, pys = [], []
    for vx0, vy0 in ((v0x, v0y), (0, 0)):
        for dxy in range(25):
            dx, dy = (dxy % 5) - 2, (dxy // 5) - 2
            pxs.append(jnp.broadcast_to(cx[None] + vx0 + dx, (R, n)))
            pys.append(jnp.broadcast_to(cy[None] + vy0 + dy, (R, n)))
    px_s, py_s = jnp.stack(pxs), jnp.stack(pys)
    if penalty:
        costs = costs + (jnp.abs(px_s - (cx[None] + v0x)[None])
                         + jnp.abs(py_s - (cy[None] + v0y)[None])) \
            * (VECTOR_DIFF_WEIGHT // 2)
    gy = py_s + row0
    invalid = (px_s < 0) | (px_s > W - 8) | (gy < 0) | (gy > full_h - 8)
    costs = jnp.where(invalid, BIG, costs).astype(jnp.int32)
    best_x, best_y, _, _ = _select_first_min(costs, px_s, py_s)

    vx = (best_x - cx[None]) * pixel_rate
    vy = (best_y - cy[None]) * pixel_rate
    return jnp.stack([vx, vy], axis=-1).reshape(R, nby, nbx, 2)


def _sixtap_static(patch, phase_x: int, phase_y: int, size: int):
    """Six-tap interpolation with *static* phases: slices x scalar taps.
    patch: (..., size+5, size+5) -> (..., size, size)."""
    fx = SIXTAP_FILTERS[phase_x]
    fy = SIXTAP_FILTERS[phase_y]
    h = sum(int(fx[k]) * patch[..., :, k:k + size] for k in range(6)
            if int(fx[k]) != 0)
    h = jnp.clip((h + 64) >> 7, 0, 255)
    v = sum(int(fy[k]) * h[..., k:k + size, :] for k in range(6)
            if int(fy[k]) != 0)
    return jnp.clip((v + 64) >> 7, 0, 255)


def _sixtap_interp8(sub, phase_x: int, phase_y: int):
    """Interpolate an 8x8 prediction as the reference does per 4x4 quadrant
    (GPU_kernels.cl construct): each quadrant is an independent 9x9->4x4
    six-tap, NOT a seamless 13x13->8x8 pass, because the vertical pass of
    each quadrant reads the *clamped* horizontal intermediate of its own 9
    rows.  sub: (..., 13, 13)."""
    quads = []
    for qy in (0, 4):
        row = []
        for qx in (0, 4):
            q = sub[..., qy:qy + 9, qx:qx + 9]
            row.append(_sixtap_static(q, phase_x, phase_y, 4))
        quads.append(jnp.concatenate(row, axis=-1))
    return jnp.concatenate(quads, axis=-2)


def search_qpel(cur, ref_pad, pads, fullpel_vec, row0=0, full_h: int = 0,
                tbl3=None):
    """cur (H,W); ref_pad (R,PH,PW) padded; fullpel_vec (R, nby, nbx, 2).
    Returns (vectors (R,nby,nbx,2) qpel, Bdiff (R,nby,nbx),
    best_pred (R, n, 8, 8) — the winning candidate's interpolated block,
    i.e. the luma motion-compensated prediction, for free).

    The 25 refinement candidates sit at +-2 qpel around a *full-pel* base, so
    every block shares the candidate's subpel phase: interpolation becomes a
    static-coefficient convolution over one 17x17 patch per block.

    row0/full_h: see search_level — candidate validity is checked against
    the FULL frame bounds when `cur` is a row shard of a taller frame."""
    H, W = cur.shape
    if not full_h:
        full_h = H
    R = ref_pad.shape[0]
    py0, px0 = pads
    nbx, nby = W // 8, H // 8
    n = nbx * nby
    cx = jnp.tile(jnp.arange(nbx) * 8, nby) * 4
    cy = jnp.repeat(jnp.arange(nby) * 8, nbx) * 4
    v0 = fullpel_vec.reshape(R, n, 2) * 4
    v0x, v0y = v0[..., 0], v0[..., 1]

    cur_blocks = _plane_blocks8(cur).reshape(n, 64)

    # one 17x17 patch per block: fullpel base c+v0, margin -3..+13
    # (interp apron -2..+3 per 4x4 half, +-1 fullpel candidate shift)
    fv = fullpel_vec.reshape(R, n, 2)
    ridx = jnp.broadcast_to(jnp.arange(R)[:, None], (R, n))

    # candidate 25: absolute zero MV, phase 0 -> plain block compare
    # (GPU_kernels.cl:1144-1150); ordered after the 25 refinement
    # candidates, so it wins only on strictly smaller cost
    zero_plane = jax.lax.slice(ref_pad, (0, py0, px0), (R, py0 + H, px0 + W))
    zero64 = _plane_blocks8(zero_plane).reshape(R, n, 64)

    from vp8oclenc_tpu.ops import pallas_kernels as PK
    pmode = PK.mode()
    if pmode != "off" and R == 3 and n >= _PALLAS_MIN_N \
            and isinstance(row0, int) and row0 == 0 and full_h == H:
        # Pallas: y-roll alignment + interpolation + cost + penalty/
        # validity + first-min select of the 25 refinement candidates in
        # one VMEM-resident kernel over the phase-table gather (per-ref
        # state tables when given, else built here); the zero-MV
        # candidate merges here
        PH, PW = ref_pad.shape[-2:]
        TB, TC = PH // 8, PW // 16
        raw, ry = _gather_windows(tbl3, ref_pad, TB, TC, ridx,
                                  cy[None] // 4 + fv[..., 1] + (py0 - 3),
                                  cx[None] // 4 + fv[..., 0] + (px0 - 3))
        cost25, idx25, pred25 = PK.qpel_search25(
            raw, ry, cur_blocks.astype(jnp.uint8), v0.astype(jnp.int32),
            nbx, W, full_h, interpret=(pmode == "interpret"))
        zcost = T.dct_cost_rows64(zero64.astype(jnp.bfloat16)
                                  - cur_blocks.astype(jnp.bfloat16)[None])
        zwin = zcost.astype(jnp.int32) < cost25
        d25 = np.arange(25, dtype=np.int32)
        dx_t = jnp.asarray(d25 % 5 - 2)
        dy_t = jnp.asarray(d25 // 5 - 2)
        best_x = jnp.where(zwin, cx[None], cx[None] + v0x + dx_t[idx25])
        best_y = jnp.where(zwin, cy[None], cy[None] + v0y + dy_t[idx25])
        best_cost = jnp.where(zwin, zcost, cost25)
        best_pred = jnp.where(zwin[..., None], zero64, pred25) \
            .reshape(R, n, 8, 8)
    else:
        # XLA fallback (CPU backend, row-sharded search): all 25 candidates'
        # six-tap interpolations as two constant MXU matmuls
        # (H passes then V passes, _qpel_filter_matrices) with the spec
        # rounding clip((x+64)>>7, 0, 255) between and after — elementwise
        # identical to the reference's per-candidate construct
        # (GPU_kernels.cl:563-774) and to the quadrant-wise construction
        # (tests/test_tpu_intra.py::test_sixtap_seamless_equals_quadrant).
        patch = _tile_take_patch(ref_pad, ridx,
                                 cy[None] // 4 + fv[..., 1] + (py0 - 3),
                                 cx[None] // 4 + fv[..., 0] + (px0 - 3),
                                 17, 17, as_flat=True)
        cur64 = cur_blocks.astype(jnp.bfloat16)
        FH, FV = _qpel_filter_matrices()
        rnd = lambda x: jnp.clip(jnp.floor((x + 64.0) * (1.0 / 128.0)), 0, 255)
        h = rnd(_const_matmul(patch, FH))                  # (R, n, 680) f32
        v = rnd(_const_matmul(h, FV))                      # (R, n, 1600) f32
        preds = v.astype(jnp.bfloat16).reshape(R, n, 25, 64)

        pxs, pys = [], []
        for cand in range(25):
            dx, dy = (cand % 5) - 2, (cand // 5) - 2
            pxs.append(jnp.broadcast_to(cx[None] + v0x + dx, (R, n)))
            pys.append(jnp.broadcast_to(cy[None] + v0y + dy, (R, n)))
        zero_pred = zero64.reshape(R, n, 1, 64).astype(jnp.bfloat16)
        pxs.append(jnp.broadcast_to(cx, (R, n)))
        pys.append(jnp.broadcast_to(cy, (R, n)))

        pred_s = jnp.concatenate([preds, zero_pred], axis=2)  # (R, n, 26, 64)
        px_s, py_s = jnp.stack(pxs), jnp.stack(pys)
        res = pred_s - cur64[None, :, None, :]
        costs = jnp.moveaxis(T.dct_cost_rows64(res), 2, 0)    # (26, R, n)
        pen = (jnp.abs(px_s - (cx[None] + v0x)[None])
               + jnp.abs(py_s - (cy[None] + v0y)[None])) \
            * (VECTOR_DIFF_WEIGHT // 2)
        pen = pen.at[25].set(0)        # zero-MV candidate carries no penalty
        costs = costs + pen
        gy = py_s + row0 * 4
        invalid = (px_s < 0) | (px_s > W * 4 - 32) | (gy < 0) \
            | (gy > full_h * 4 - 32)
        costs = jnp.where(invalid, BIG, costs).astype(jnp.int32)
        best_x, best_y, best_cost, best_idx = \
            _select_first_min(costs, px_s, py_s)
        best_pred = jnp.take_along_axis(
            pred_s, best_idx[..., None, None], axis=2)[:, :, 0] \
            .astype(jnp.int32).reshape(R, n, 8, 8)

    vx = best_x - cx[None]
    vy = best_y - cy[None]
    nonzero = (vx != 0) | (vy != 0)
    best_cost = best_cost - jnp.where(
        nonzero,
        (jnp.abs(vx - v0x) + jnp.abs(vy - v0y)) * (VECTOR_DIFF_WEIGHT // 2), 0)
    return (jnp.stack([vx, vy], axis=-1).reshape(R, nby, nbx, 2),
            best_cost.reshape(R, nby, nbx), best_pred)


def hierarchical_search(cur_pyr, ref_pyr, row0=0, full_h: int = 0,
                        tbls=None):
    """cur_pyr: list of (H_l, W_l) planes; ref_pyr: build_ref_pyramid output.
    Returns (vectors, Bdiff, best_pred) from the qpel stage.

    row0 (traced ok) / full_h (static): when cur_pyr holds the row shard of
    a `full_h`-tall frame starting at global row `row0` (both multiples of
    16), every level's candidate validity is evaluated in global frame
    coordinates so the sharded result equals the single-chip kernel's.

    tbls: optional per-level list (levels 0..2) of 3-tuples of per-ref
    phase tables from the ref-state kernel (the Pallas gather path)."""
    vec = None
    for lvl, rate in ((4, 16), (3, 8), (2, 4), (1, 2)):
        h, w = cur_pyr[lvl].shape
        if (w // 8) == 0 or (h // 8) == 0:
            continue
        plane, pads, _ = ref_pyr[lvl]
        vec = search_level(cur_pyr[lvl], plane, pads, vec, rate,
                           penalty=(rate < 4),
                           row0=row0 >> lvl if full_h else 0,
                           full_h=full_h >> lvl if full_h else 0,
                           tbl3=tbls[lvl] if tbls and lvl < len(tbls)
                           else None)
    plane, pads, _ = ref_pyr[0]
    vec = search_level(cur_pyr[0], plane, pads, vec, 1, penalty=True,
                       row0=row0, full_h=full_h,
                       tbl3=tbls[0] if tbls else None)
    return search_qpel(cur_pyr[0], plane, pads, vec, row0=row0,
                       full_h=full_h, tbl3=tbls[0] if tbls else None)


def hierarchical_search_sharded(cur_pyr, cur_full2, ref_pyr, row0,
                                full_h: int, axis: str):
    """Row-sharded hierarchical search, bit-identical to the single-chip
    hierarchical_search.

    The coarse levels (4, 3, 2) CANNOT be row-sharded exactly: a shard's
    local 8px block grid aligns with the global grid only when the shard
    offset divides 8*2^l, which fails at l >= 2 for odd shard positions.
    They are tiny (level 2 = 1/16 of the frame pixels), so every chip runs
    them on the full frame: cur_full2 is the all-gathered level-2 current
    plane (levels 3-4 derived locally by downsampling), and ref_pyr[2..4]
    are replicated full padded planes.  Levels 1 and 0 + qpel are sharded:
    ref_pyr[0..1] are halo strips (parallel.tile.build_ref_strips), and
    level 1 indexes the replicated level-2 vector field with global
    coordinates (src_off)."""
    cur_full3 = downsample2(cur_full2)
    cur_full4 = downsample2(cur_full3)
    vec = None
    for lvl, cur_l, rate in ((4, cur_full4, 16), (3, cur_full3, 8),
                             (2, cur_full2, 4)):
        h, w = cur_l.shape
        if (w // 8) == 0 or (h // 8) == 0:
            continue
        plane, pads, _ = ref_pyr[lvl]
        vec = search_level(cur_l, plane, pads, vec, rate, penalty=(rate < 4))
    plane, pads, _ = ref_pyr[1]
    vec = search_level(cur_pyr[1], plane, pads, vec, 2, penalty=True,
                       row0=row0 >> 1, full_h=full_h >> 1,
                       src_off=row0 >> 1)
    plane, pads, _ = ref_pyr[0]
    vec = search_level(cur_pyr[0], plane, pads, vec, 1, penalty=True,
                       row0=row0, full_h=full_h)
    return search_qpel(cur_pyr[0], plane, pads, vec, row0=row0, full_h=full_h)


# ---------------------------------------------------------------------------
# motion compensation (chroma; luma prediction comes fused from search_qpel)
# ---------------------------------------------------------------------------

def _sixtap_blocks_flat(patch_flat, tx, ty):
    """Per-4x4-block six-tap interpolation on FLAT patch rows.

    patch_flat (n, 288) u8: a 9-row x 4-used-col patch stored at 32-lane
    row stride (_tile_take_patch as_flat with ph=9, pw=9 -> W2=32; rows
    0..8 live at lanes r*32 + c).  tx/ty (n, 6) int32 per-block taps.
    Returns (n, 4, 4) int32 interpolated blocks.

    All six-tap passes are full-lane-width shifted adds over the flat
    axis — the (n, 9, 4)-minor formulation this replaces tiled each
    4-wide slice to 128 lanes (32x physical inflation) and made chroma
    MC one of the largest items of the fused inter program."""
    W2 = 32
    L = patch_flat.shape[-1]
    x = patch_flat.astype(jnp.int32)
    sl = lambda a, k, n: jax.lax.slice_in_dim(a, k, k + n, axis=-1)
    # H pass: h[r*32+j] = sum_k patch[r*32+j+k]*tx[k], j <= 3 used
    # (j+k <= 8 < 32 never crosses a row boundary)
    hL = L - 5
    h = sum(sl(x, k, hL) * tx[:, k, None] for k in range(6))
    h = jnp.clip((h + 64) >> 7, 0, 255)
    # V pass: v[r*32+j] = sum_k h[(r+k)*32+j]*ty[k], r, j <= 3 used
    # (length 3*W2+4 covers lane 3*32+3; k=5 reads h up to lane 259 < hL)
    vL = 3 * W2 + 4
    v = sum(sl(h, k * W2, vL) * ty[:, k, None] for k in range(6))
    v = jnp.clip((v + 64) >> 7, 0, 255)
    return jnp.stack([sl(v, r * W2, 4) for r in range(4)], axis=-2)


def mc_predict_selected(refs_pad, pads, mvs, sel, mb_idx, q_idx, scale: int,
                        H: int, W: int):
    """Single-pass chroma MC from the per-MB *selected* reference.

    refs_pad (R, PH, PW) padded; sel (mbc,) in 0..R-1; mvs (mbc, 4, 2) in
    quarter-pel (luma) units; per 4x4 block a (9,9) six-tap source patch is
    fetched with one tile-row take from the selected ref."""
    py0, px0 = pads
    nbx = W // 4
    bx = jnp.tile(jnp.arange(nbx), H // 4)
    by = jnp.repeat(jnp.arange(H // 4), nbx)
    v = mvs[mb_idx, q_idx]                              # (n, 2)
    ax = bx * 4 * scale + v[:, 0]
    ay = by * 4 * scale + v[:, 1]
    fy, fx = ay // scale, ax // scale
    phy = (ay % scale) * (8 // scale)
    phx = (ax % scale) * (8 // scale)
    patch = _tile_take_patch(refs_pad, sel[mb_idx].astype(jnp.int32),
                             fy + (py0 - 2), fx + (px0 - 2), 9, 9,
                             as_flat=True)
    blocks = _sixtap_blocks_flat(patch, _taps_select(phx), _taps_select(phy))
    return blocks.reshape(H // 4, nbx, 4, 4).swapaxes(1, 2).reshape(H, W)


def mc_predict_selected_uv(refs_u_pad, refs_v_pad, pads, mvs, sel, mb_idx,
                           q_idx, scale: int, H: int, W: int):
    """U and V chroma MC as ONE gather+interp chain: the planes stack to
    (6, PH, PW) and the V jobs address plane sel+3, so the take, the
    shift passes and the tap selects all run once over 2n blocks instead
    of twice over n (each pass has fixed per-op cost on TPU)."""
    py0, px0 = pads
    refs6 = jnp.concatenate([refs_u_pad, refs_v_pad], axis=0)
    nbx = W // 4
    bx = jnp.tile(jnp.arange(nbx), H // 4)
    by = jnp.repeat(jnp.arange(H // 4), nbx)
    bx2 = jnp.concatenate([bx, bx])
    by2 = jnp.concatenate([by, by])
    mb2 = jnp.concatenate([mb_idx, mb_idx])
    q2 = jnp.concatenate([q_idx, q_idx])
    n = bx.shape[0]
    sel_blk = sel[mb2].astype(jnp.int32) \
        + jnp.concatenate([jnp.zeros(n, jnp.int32),
                           jnp.full(n, 3, jnp.int32)])
    v = mvs[mb2, q2]                                    # (2n, 2)
    ax = bx2 * 4 * scale + v[:, 0]
    ay = by2 * 4 * scale + v[:, 1]
    fy, fx = ay // scale, ax // scale
    phy = (ay % scale) * (8 // scale)
    phx = (ax % scale) * (8 // scale)
    patch = _tile_take_patch(refs6, sel_blk, fy + (py0 - 2),
                             fx + (px0 - 2), 9, 9, as_flat=True)
    blocks = _sixtap_blocks_flat(patch, _taps_select(phx), _taps_select(phy))
    planes = blocks.reshape(2, H // 4, nbx, 4, 4).swapaxes(2, 3) \
        .reshape(2, H, W)
    return planes[0], planes[1]


# ---------------------------------------------------------------------------
# transforms over MB blocks
# ---------------------------------------------------------------------------

def _mb_blocks_luma(plane, mbw, mbh):
    b = plane.reshape(mbh, 4, 4, mbw, 4, 4)
    return b.transpose(0, 3, 1, 4, 2, 5).reshape(mbh * mbw, 16, 4, 4)


def _luma_from_mb_blocks(blocks, mbw, mbh):
    b = blocks.reshape(mbh, mbw, 4, 4, 4, 4).transpose(0, 2, 4, 1, 3, 5)
    return b.reshape(mbh * 16, mbw * 16)


def _mb_blocks_chroma(plane, mbw, mbh):
    b = plane.reshape(mbh, 2, 4, mbw, 2, 4)
    return b.transpose(0, 3, 1, 4, 2, 5).reshape(mbh * mbw, 4, 4, 4)


def _chroma_from_mb_blocks(blocks, mbw, mbh):
    b = blocks.reshape(mbh, mbw, 2, 2, 4, 4).transpose(0, 2, 4, 1, 3, 5)
    return b.reshape(mbh * 8, mbw * 8)


def _blocks8_to_plane(blocks, nby, nbx):
    """(n, 8, 8) -> (H, W) raster plane."""
    return blocks.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(nby * 8, nbx * 8)


def transform_mb_luma(res_blocks, parts, y_dc_q, y_ac_q, y2_dc_q, y2_ac_q):
    mbc = res_blocks.shape[0]
    coeffs = T.fdct4x4(res_blocks)
    has_y2 = parts == ARE16X16
    bc = lambda q: jnp.broadcast_to(jnp.asarray(q, jnp.int32), (mbc,))
    y_dc_q, y_ac_q = bc(y_dc_q), bc(y_ac_q)
    y2_dc_q, y2_ac_q = bc(y2_dc_q), bc(y2_ac_q)
    dc_q_eff = jnp.where(has_y2, 1, y_dc_q)
    levels = T.quant4x4(coeffs, dc_q_eff[:, None], y_ac_q[:, None])
    dq = T.dequant4x4(levels, dc_q_eff[:, None], y_ac_q[:, None])
    dcs = coeffs[:, :, 0, 0].reshape(mbc, 4, 4)
    y2c = T.fwht4x4(dcs)
    y2_levels = T.quant4x4(y2c, y2_dc_q, y2_ac_q)
    y2_dq = T.dequant4x4(y2_levels, y2_dc_q, y2_ac_q)
    y2_rec_dc = T.iwht4x4(y2_dq).reshape(mbc, 16)
    dq = dq.at[:, :, 0, 0].set(
        jnp.where(has_y2[:, None], y2_rec_dc, dq[:, :, 0, 0]))
    rec_res = T.idct4x4(dq)
    levels_z = T.zigzag(levels)
    levels_z = levels_z.at[:, :, 0].set(
        jnp.where(has_y2[:, None], 0, levels_z[:, :, 0]))
    y2_z = jnp.where(has_y2[:, None], T.zigzag(y2_levels), 0)
    return levels_z, y2_z, rec_res


def transform_mb_chroma(res_blocks, dc_q, ac_q):
    mbc = res_blocks.shape[0]
    dc = jnp.broadcast_to(jnp.asarray(dc_q, jnp.int32), (mbc,))[:, None]
    ac = jnp.broadcast_to(jnp.asarray(ac_q, jnp.int32), (mbc,))[:, None]
    levels = T.quant4x4(T.fdct4x4(res_blocks), dc, ac)
    rec_res = T.idct4x4(T.dequant4x4(levels, dc, ac))
    return T.zigzag(levels), rec_res


# ---------------------------------------------------------------------------
# SSIM — integer Q15 (vp8oclenc_tpu.ssim_fx), deterministic across backends
# ---------------------------------------------------------------------------

def mb_ssim(y, ry, u, ru, v, rv):
    """(mbc,) int32 Q15 3-plane score (ssim_fx.mb_ssim_fx with xp=jnp)."""
    return mb_ssim_fx(y, ry, u, ru, v, rv, xp=jnp)


# ---------------------------------------------------------------------------
# full inter pixel step
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _cachehook_build_inter_kernel(wrk_w: int, wrk_h: int,
                                  ssim_enabled: bool = True,
                                  full_h: int = 0):
    """ssim_enabled=True: 4 progressive segment passes, un-filtered recon
    returned (the host SSIM controller may replace MBs before filtering).
    ssim_enabled=False: single LQ pass and the loop filter fused in — the
    whole per-frame pixel path is one device call.

    full_h != 0: SHARD mode — wrk_h is the height of one row shard of a
    full_h-tall frame; body takes a leading traced `row0` (the shard's
    global top row) so search validity runs in global coordinates, and the
    ref pyramid/chroma pads are halo rows exchanged by the caller
    (parallel/tile.py).  With ssim_enabled, the frozen-recon replacement
    controller exchanges its ghost rows / winner flags over ICI
    (intra_replace_device shard mode)."""
    mbw, mbh = wrk_w // 16, wrk_h // 16
    mbc = mbw * mbh
    nby, nbx = wrk_h // 8, wrk_w // 8

    def cmap():
        nbxc = wrk_w // 8
        bx = np.tile(np.arange(nbxc), wrk_h // 8)
        by = np.repeat(np.arange(wrk_h // 8), nbxc)
        return ((by // 2) * mbw + bx // 2, (by % 2) * 2 + bx % 2)

    cmb, cq = (np.asarray(a) for a in cmap())

    def body(y, u, v, ref_pyr, refs_u_pad, refs_v_pad, ref_valid,
             seg_y_dc, seg_y_ac, seg_y2_dc, seg_y2_ac, seg_uv_dc, seg_uv_ac,
             ssim_target, row0=0, ref_tbls=None):
        """ref_pyr: build_ref_pyramid-format list; refs_*_pad: (3, PH, PW)
        padded chroma; ref_valid: (3,) bool; seg_*: (4,) int32."""
        cur_pyr = [y]
        for _ in range(4):
            cur_pyr.append(downsample2(cur_pyr[-1]))

        if full_h:
            cur_full2 = jax.lax.all_gather(cur_pyr[2], "tile", axis=0,
                                           tiled=True)
            vecs, diffs, best_pred = hierarchical_search_sharded(
                cur_pyr, cur_full2, ref_pyr, row0, full_h, "tile")
        else:
            vecs, diffs, best_pred = hierarchical_search(cur_pyr, ref_pyr,
                                                          tbls=ref_tbls)

        # reference selection (LAST <= ALTREF <= GOLDEN on ties)
        def mb_sum(d):
            return d.reshape(3, mbh, 2, mbw, 2).sum(axis=(2, 4)).reshape(3, mbc)

        d = mb_sum(diffs)
        d = jnp.where(ref_valid[:, None], d, BIG * 4)
        d_last, d_gold, d_alt = d[0], d[1], d[2]
        ref_sel = jnp.where(d_last <= d_alt, 0, 2)
        d_best = jnp.minimum(d_last, d_alt)
        ref_sel = jnp.where(d_best <= d_gold, ref_sel, 1)

        q = vecs.reshape(3, mbh, 2, mbw, 2, 2).transpose(0, 1, 3, 2, 4, 5) \
            .reshape(3, mbc, 4, 2)
        mvs = jnp.take_along_axis(q, ref_sel[None, :, None, None], axis=0)[0]
        mvs = mvs.astype(jnp.int32)

        same = jnp.all(mvs == mvs[:, :1, :], axis=(1, 2))
        parts = jnp.where(same, ARE16X16, ARE8X8).astype(jnp.int32)

        # luma prediction: the qpel winner's interpolated blocks, selected ref
        sel_blocks = jnp.broadcast_to(
            ref_sel.reshape(mbh, mbw)[:, None, :, None], (mbh, 2, mbw, 2)) \
            .reshape(nby * nbx)
        pred_b = best_pred[0]
        pred_b = jnp.where((sel_blocks == 1)[:, None, None], best_pred[1], pred_b)
        pred_b = jnp.where((sel_blocks == 2)[:, None, None], best_pred[2], pred_b)
        pred_y = _blocks8_to_plane(pred_b, nby, nbx)

        cpads = (PAD_C_FULL, PAD_C_FULL)
        pred_u, pred_v = mc_predict_selected_uv(
            refs_u_pad, refs_v_pad, cpads, mvs, ref_sel,
            jnp.asarray(cmb), jnp.asarray(cq), 8, wrk_h // 2, wrk_w // 2)

        res_y = _mb_blocks_luma(y.astype(jnp.int32) - pred_y, mbw, mbh)
        res_u = _mb_blocks_chroma(u.astype(jnp.int32) - pred_u, mbw, mbh)
        res_v = _mb_blocks_chroma(v.astype(jnp.int32) - pred_v, mbw, mbh)
        pred_y_b = _mb_blocks_luma(pred_y, mbw, mbh)
        pred_u_b = _mb_blocks_chroma(pred_u, mbw, mbh)
        pred_v_b = _mb_blocks_chroma(pred_v, mbw, mbh)

        # progressive segment requantization LQ -> UQ (ssim_target is the
        # 3-plane Q15 integer threshold; -1 when SSIM control is off)
        def seg_pass(i, st):
            (levels_y, levels_y2, levels_u, levels_v, seg_ids,
             cur_ssim, rec_y_b, rec_u_b, rec_v_b) = st
            sid = LQ_SEGMENT - i
            active = cur_ssim <= ssim_target
            lz, y2z, rr = transform_mb_luma(
                res_y, parts, seg_y_dc[sid], seg_y_ac[sid],
                seg_y2_dc[sid], seg_y2_ac[sid])
            uz, ur = transform_mb_chroma(res_u, seg_uv_dc[sid], seg_uv_ac[sid])
            vz, vr = transform_mb_chroma(res_v, seg_uv_dc[sid], seg_uv_ac[sid])
            am = active[:, None, None]
            seg_ids = jnp.where(active, sid, seg_ids)
            levels_y = jnp.where(am, lz, levels_y)
            levels_y2 = jnp.where(active[:, None], y2z, levels_y2)
            levels_u = jnp.where(am, uz, levels_u)
            levels_v = jnp.where(am, vz, levels_v)
            amb = active[:, None, None, None]
            rec_y_b = jnp.where(amb, jnp.clip(pred_y_b + rr, 0, 255), rec_y_b)
            rec_u_b = jnp.where(amb, jnp.clip(pred_u_b + ur, 0, 255), rec_u_b)
            rec_v_b = jnp.where(amb, jnp.clip(pred_v_b + vr, 0, 255), rec_v_b)
            ry = _luma_from_mb_blocks(rec_y_b, mbw, mbh)
            ru = _chroma_from_mb_blocks(rec_u_b, mbw, mbh)
            rv = _chroma_from_mb_blocks(rec_v_b, mbw, mbh)
            new_ssim = mb_ssim(y, ry, u, ru, v, rv)
            cur_ssim = jnp.where(active, new_ssim, cur_ssim)
            return (levels_y, levels_y2, levels_u, levels_v, seg_ids,
                    cur_ssim, rec_y_b, rec_u_b, rec_v_b)

        st = (jnp.zeros((mbc, 16, 16), jnp.int32),
              jnp.zeros((mbc, 16), jnp.int32),
              jnp.zeros((mbc, 4, 16), jnp.int32),
              jnp.zeros((mbc, 4, 16), jnp.int32),
              jnp.full((mbc,), LQ_SEGMENT, jnp.int32),
              jnp.full((mbc,), UNCODED_FX, jnp.int32),
              jnp.zeros((mbc, 16, 4, 4), jnp.int32),
              jnp.zeros((mbc, 4, 4, 4), jnp.int32),
              jnp.zeros((mbc, 4, 4, 4), jnp.int32))
        st = jax.lax.fori_loop(0, 4 if ssim_enabled else 1, seg_pass, st)
        (levels_y, levels_y2, levels_u, levels_v, seg_ids,
         cur_ssim, rec_y_b, rec_u_b, rec_v_b) = st

        recon_y = _luma_from_mb_blocks(rec_y_b, mbw, mbh).astype(jnp.uint8)
        recon_u = _chroma_from_mb_blocks(rec_u_b, mbw, mbh).astype(jnp.uint8)
        recon_v = _chroma_from_mb_blocks(rec_v_b, mbw, mbh).astype(jnp.uint8)

        replaced = jnp.int32(0)
        modes4 = jnp.zeros((mbc * 8,), jnp.uint8)
        if ssim_enabled:
            # batched SSIM intra replacement (spec/inter.py:_intra_replace;
            # reference test_inter_on_intra, intra_part.h:855-1087) fused
            # into the same device program
            from vp8oclenc_tpu.ops.intra_replace import (
                intra_replace_device, mb_patches_to_chroma_blocks,
                mb_patches_to_luma_blocks)
            from vp8oclenc_tpu.tables import ARE4X4
            (applied, b_sid, b_modes, b_lv_y, b_lv_u, b_lv_v,
             b_ry, b_ru, b_rv, cur_ssim) = intra_replace_device(
                y, u, v, recon_y, recon_u, recon_v, cur_ssim,
                seg_y_dc, seg_y_ac, seg_uv_dc, seg_uv_ac, ssim_target,
                mbw, mbh,
                shard=("tile", full_h // wrk_h) if full_h else None)
            a1 = applied[:, None]
            a2 = applied[:, None, None]
            a3 = applied[:, None, None, None]
            seg_ids = jnp.where(applied, b_sid, seg_ids)
            parts = jnp.where(applied, ARE4X4, parts)
            levels_y = jnp.where(a2, b_lv_y, levels_y.reshape(mbc, 16, 16))
            levels_y2 = jnp.where(a1, 0, levels_y2)
            levels_u = jnp.where(a2, b_lv_u, levels_u)
            levels_v = jnp.where(a2, b_lv_v, levels_v)
            rec_y_b = jnp.where(a3, mb_patches_to_luma_blocks(b_ry), rec_y_b)
            rec_u_b = jnp.where(a3, mb_patches_to_chroma_blocks(b_ru), rec_u_b)
            rec_v_b = jnp.where(a3, mb_patches_to_chroma_blocks(b_rv), rec_v_b)
            recon_y = _luma_from_mb_blocks(rec_y_b, mbw, mbh).astype(jnp.uint8)
            recon_u = _chroma_from_mb_blocks(rec_u_b, mbw, mbh).astype(jnp.uint8)
            recon_v = _chroma_from_mb_blocks(rec_v_b, mbw, mbh).astype(jnp.uint8)
            replaced = applied.sum().astype(jnp.int32)
            md = jnp.where(a1, b_modes, 0).astype(jnp.uint8).reshape(mbc, 8, 2)
            modes4 = (md[:, :, 0] | (md[:, :, 1] << 4)).reshape(-1)

        # pack host-bound outputs into few arrays (each D2H transfer through
        # the tunnel pays fixed latency)
        levels_pack = jnp.concatenate(
            [levels_y.reshape(mbc, 16, 16), levels_u, levels_v,
             levels_y2[:, None, :]], axis=1).astype(jnp.int16)
        meta = jnp.concatenate(
            [seg_ids[:, None], parts[:, None], ref_sel[:, None],
             mvs.reshape(mbc, 8)], axis=1).astype(jnp.int32)

        return (levels_pack, meta, cur_ssim, recon_y, recon_u, recon_v,
                modes4, replaced)

    def kernel(y, u, v, refs_y, refs_u, refs_v, ref_valid,
               seg_y_dc, seg_y_ac, seg_y2_dc, seg_y2_ac, seg_uv_dc, seg_uv_ac,
               ssim_target, taps):
        """Compat entry: raw (3, H, W) refs, pyramids built in-kernel."""
        del taps  # taps are compile-time constants now
        ref_pyr = build_ref_pyramid(refs_y, wrk_h, wrk_w)
        refs_u_pad = _pad_tiles(refs_u, PAD_C_FULL, PAD_C_FULL)
        refs_v_pad = _pad_tiles(refs_v, PAD_C_FULL, PAD_C_FULL)
        return body(y, u, v, ref_pyr, refs_u_pad, refs_v_pad, ref_valid,
                    seg_y_dc, seg_y_ac, seg_y2_dc, seg_y2_ac, seg_uv_dc,
                    seg_uv_ac, ssim_target)

    def kernel_pyr(y, u, v, pyrs, tbls, u_pads, v_pads, ref_valid,
                   seg_y_dc, seg_y_ac, seg_y2_dc, seg_y2_ac, seg_uv_dc,
                   seg_uv_ac, ssim_target):
        """Cached-pyramid entry: pyrs = 3-tuple (last/golden/altref) of
        5-tuples of padded level planes from build_ref_state_kernel;
        u_pads/v_pads: 3-tuples of padded chroma.  Reference pyramids are
        per-frame invariants of each reference (the reference encoder also
        builds each ref's pyramid once and copies it on promotion,
        inter_part.h:35-50) — only LAST's is rebuilt per frame."""
        ref_pyr = []
        pad, h, w = PAD_Y_FULL, wrk_h, wrk_w
        for lvl in range(5):
            stacked = jnp.stack([pyrs[0][lvl], pyrs[1][lvl], pyrs[2][lvl]])
            ref_pyr.append((stacked, (pad, pad), (h, w)))
            pad //= 2
            h //= 2
            w //= 2
        refs_u_pad = jnp.stack(list(u_pads))
        refs_v_pad = jnp.stack(list(v_pads))
        ref_tbls = [tuple(tbls[r][lvl] for r in range(3)) for lvl in range(3)]
        return body(y, u, v, ref_pyr, refs_u_pad, refs_v_pad, ref_valid,
                    seg_y_dc, seg_y_ac, seg_y2_dc, seg_y2_ac, seg_uv_dc,
                    seg_uv_ac, ssim_target, ref_tbls=ref_tbls)

    def kernel_yuv(yuv, pyrs, tbls, u_pads, v_pads, ref_valid,
                   seg_y_dc, seg_y_ac, seg_y2_dc, seg_y2_ac, seg_uv_dc,
                   seg_uv_ac, ssim_target):
        """Single-upload entry: yuv is the flat uint8 concatenation of the
        padded Y, U, V planes (one H2D transfer instead of three — the
        tunnel charges fixed latency per transfer)."""
        ny = wrk_h * wrk_w
        nc = (wrk_h // 2) * (wrk_w // 2)
        y = yuv[:ny].reshape(wrk_h, wrk_w)
        u = yuv[ny:ny + nc].reshape(wrk_h // 2, wrk_w // 2)
        v = yuv[ny + nc:].reshape(wrk_h // 2, wrk_w // 2)
        return kernel_pyr(y, u, v, pyrs, tbls, u_pads, v_pads, ref_valid,
                          seg_y_dc, seg_y_ac, seg_y2_dc, seg_y2_ac,
                          seg_uv_dc, seg_uv_ac, ssim_target)

    jitted = jax.jit(kernel)
    jitted_pyr = jax.jit(kernel_pyr)
    jitted_yuv = jax.jit(kernel_yuv)
    taps_dev = jax.device_put(_SIXTAP)

    def run(*args):
        return jitted(*args, taps_dev)

    run.pyr = jitted_pyr
    run.yuv = jitted_yuv

    def traceable_shard(row0, y, u, v, pyrs, u_pads, v_pads, ref_valid,
                        seg_y_dc, seg_y_ac, seg_y2_dc, seg_y2_ac, seg_uv_dc,
                        seg_uv_ac, ssim_target):
        """Un-jitted kernel_pyr-style entry with a traced global row offset;
        called inside shard_map by parallel/tile.py."""
        ref_pyr = []
        pad, h, w = PAD_Y_FULL, wrk_h, wrk_w
        for lvl in range(5):
            stacked = jnp.stack([pyrs[0][lvl], pyrs[1][lvl], pyrs[2][lvl]])
            ref_pyr.append((stacked, (pad, pad), (h, w)))
            pad //= 2
            h //= 2
            w //= 2
        refs_u_pad = jnp.stack(list(u_pads))
        refs_v_pad = jnp.stack(list(v_pads))
        return body(y, u, v, ref_pyr, refs_u_pad, refs_v_pad, ref_valid,
                    seg_y_dc, seg_y_ac, seg_y2_dc, seg_y2_ac, seg_uv_dc,
                    seg_uv_ac, ssim_target, row0=row0)

    run.traceable_shard = traceable_shard
    return run


@lru_cache(maxsize=8)
def _cachehook_build_ref_state_kernel(wrk_w: int, wrk_h: int):
    """Per-reference device state: 5-level padded search pyramid, phase
    tables for the Pallas search levels (0..2), and padded chroma planes,
    built once when a frame becomes a reference (the counterpart of the
    reference's per-ref pyramid buffers, vp8enc.h:216-295 and promotion
    copies inter_part.h:35-50).  Building the tables HERE instead of in
    the per-frame search program means GOLDEN/ALTREF amortize across
    frames and LAST's build rides the filter chain."""
    @jax.jit
    def kern(ry, ru, rv):
        out = []
        plane, pad = ry, PAD_Y_FULL
        for lvl in range(5):
            out.append(_pad_tiles(plane, pad, pad))
            if lvl < 4:
                plane = downsample2(plane)
                pad //= 2
        tbls = tuple(build_phase_tables(out[lvl][None]) for lvl in range(3))
        return (tuple(out), tbls, _pad_tiles(ru, PAD_C_FULL, PAD_C_FULL),
                _pad_tiles(rv, PAD_C_FULL, PAD_C_FULL))
    return kern


def build_ref_state_kernel(wrk_w: int, wrk_h: int):
    from vp8oclenc_tpu.utils.jaxcache import enable
    enable()
    return _cachehook_build_ref_state_kernel(wrk_w, wrk_h)


def build_inter_kernel(wrk_w: int, wrk_h: int, ssim_enabled: bool = True):
    from vp8oclenc_tpu.utils.jaxcache import enable
    enable()
    return _cachehook_build_inter_kernel(wrk_w, wrk_h, ssim_enabled)


def build_inter_shard_fn(wrk_w: int, shard_h: int, full_h: int,
                         ssim_enabled: bool = False):
    """Traceable per-shard inter pixel step (for shard_map):
    fn(row0, y, u, v, pyrs, u_pads, v_pads, ref_valid, seg..., ssim_target)
    where y/u/v are the shard's rows and pyrs/u_pads/v_pads are halo strips
    built by parallel.tile.build_ref_strips."""
    from vp8oclenc_tpu.utils.jaxcache import enable
    enable()
    return _cachehook_build_inter_kernel(
        wrk_w, shard_h, ssim_enabled=ssim_enabled,
        full_h=full_h).traceable_shard
