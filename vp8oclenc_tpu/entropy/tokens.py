"""DCT coefficient tokenization, contexts, probability counting, emission.

Numpy-vectorized implementation of the reference CPU-device kernels
(/root/reference/src/CPU_kernels.cl:149-778): `tokenize_block`,
`count_probs` (+ `third_context` computation, including the Y2
walk-up/walk-left rule at CPU_kernels.cl:584-612), `num_div_denom`, and
`encode_coefficients` (token-partition interleaving by MB row).

Coefficients are carried as compact "token records"
(token, ctx1, band, ctx3, skip_first_bit, sign, extra) — the only data the
serial range coder needs.  Expansion to (prob, bit) pairs happens in the
native C++ packer (or the numpy fallback here).
"""
from __future__ import annotations

import numpy as np

from vp8oclenc_tpu import tables as TBL
from vp8oclenc_tpu.tables import (ARE16X16, CAT_BASE, CAT_NBITS, COEFF_BANDS,
                                  COEFF_TOKEN_BITS, COEFF_TOKEN_LENS,
                                  COEFF_TOKEN_NODES, DCT_EOB, DCT_0, DCT_1)

# Token classification by |level|: 0->DCT_0(0) handled separately;
# 1..4 -> DCT_1..DCT_4 (1..4); 5.. -> categories 5..10.
_CAT_EDGES = np.array([5, 7, 11, 19, 35, 67], dtype=np.int64)

# Extra-bit probability table padded to 11 columns: PCAT_PROBS[tok-5]
PCAT_PROBS = np.zeros((6, 11), dtype=np.uint8)
for _i, _p in enumerate(TBL.PCATS):
    PCAT_PROBS[_i, :len(_p)] = _p

TOKEN_RECORD_DTYPE = np.dtype([
    ("tok", np.uint8), ("ctx1", np.uint8), ("band", np.uint8),
    ("ctx3", np.uint8), ("skipfb", np.uint8), ("sign", np.uint8),
    ("extra", np.uint16)])


_TOKEN_LUT = np.empty(2200, dtype=np.int32)
for _a in range(2200):
    if _a <= 4:
        _TOKEN_LUT[_a] = _a
    else:
        _TOKEN_LUT[_a] = 5 + int(np.searchsorted(_CAT_EDGES, _a, side="right")) - 1


def classify_tokens(levels: np.ndarray):
    """abs level -> token id (table lookup).  levels: int array."""
    a = np.abs(levels.astype(np.int32, copy=False))
    return _TOKEN_LUT[np.minimum(a, 2199)]


def block_nonzero_flags(levels: np.ndarray, parts: np.ndarray):
    """Per-block "has nonzero coefficient" flags used for ctx3.

    levels: (mbc, 25, 16) zigzag levels; parts: (mbc,).
    Returns (y_nz (mbc,16), uv_nz (mbc,8), y2_nz (mbc,)) — Y flags skip
    position 0 when the MB is 16x16 (Y2 present)."""
    has_y2 = (parts == ARE16X16)
    y = levels[:, :16, :]
    y_nz_full = np.any(y != 0, axis=2)
    y_nz_ac = np.any(y[:, :, 1:] != 0, axis=2)
    y_nz = np.where(has_y2[:, None], y_nz_ac, y_nz_full)
    uv_nz = np.any(levels[:, 16:24, :] != 0, axis=2)
    y2_nz = np.any(levels[:, 24, :] != 0, axis=1)
    return y_nz, uv_nz, y2_nz


def _grid_ctx(nz_grid: np.ndarray):
    """above+left nonzero context from a (H, W) block grid of flags."""
    above = np.zeros_like(nz_grid, dtype=np.int32)
    above[1:, :] = nz_grid[:-1, :]
    left = np.zeros_like(above)
    left[:, 1:] = nz_grid[:, :-1]
    return above + left


def _last_valid_gather(valid: np.ndarray, values: np.ndarray, axis: int):
    """For each position along `axis`, the value at the nearest *earlier*
    position where valid, else 0.  (vectorized cummax-gather)"""
    n = valid.shape[axis]
    idx = np.where(valid, np.arange(n).reshape(
        [-1 if i == axis else 1 for i in range(valid.ndim)]), -1)
    run = np.maximum.accumulate(idx, axis=axis)
    # shift by one: context comes from strictly-earlier positions
    run = np.roll(run, 1, axis=axis)
    sl = [slice(None)] * valid.ndim
    sl[axis] = 0
    run[tuple(sl)] = -1
    got = np.take_along_axis(values, np.maximum(run, 0), axis=axis)
    return np.where(run >= 0, got, 0)


def third_context(levels: np.ndarray, parts: np.ndarray, mbw: int, mbh: int):
    """Per-block entropy context ctx3 for the first coded coefficient
    (CPU_kernels.cl:584-748).  Returns (mbc, 25) int32."""
    mbc = mbw * mbh
    y_nz, uv_nz, y2_nz = block_nonzero_flags(levels, parts)

    ctx = np.zeros((mbc, 25), dtype=np.int32)

    # Y: global (4*mbh, 4*mbw) grid
    yg = y_nz.reshape(mbh, mbw, 4, 4).transpose(0, 2, 1, 3).reshape(4 * mbh, 4 * mbw)
    cy = _grid_ctx(yg).reshape(mbh, 4, mbw, 4).transpose(0, 2, 1, 3).reshape(mbc, 16)
    ctx[:, :16] = cy

    # U, V: global (2*mbh, 2*mbw) grids
    for plane, off in ((0, 16), (1, 20)):
        g = uv_nz[:, plane * 4:(plane + 1) * 4].reshape(mbh, mbw, 2, 2) \
            .transpose(0, 2, 1, 3).reshape(2 * mbh, 2 * mbw)
        c = _grid_ctx(g).reshape(mbh, 2, mbw, 2).transpose(0, 2, 1, 3).reshape(mbc, 4)
        ctx[:, off:off + 4] = c

    # Y2: nearest above 16x16 MB in the column + nearest left 16x16 MB in the
    # same MB row (matches libvpx "retain context across MBs without Y2").
    is16 = (parts == ARE16X16).reshape(mbh, mbw)
    y2g = y2_nz.reshape(mbh, mbw).astype(np.int32)
    above = _last_valid_gather(is16, y2g, axis=0)
    left = _last_valid_gather(is16, y2g, axis=1)
    ctx[:, 24] = (above + left).reshape(mbc)
    return ctx


def tokenize_frame(levels: np.ndarray, parts: np.ndarray, mbw: int, mbh: int):
    """Tokenize all blocks of a frame into per-position token data.

    Returns dict of (mbc, 25, 16) arrays: tok, sign, extra, coded (bool),
    skipfb (bool), ctx3, plus per-block first-coeff index and per-MB skip.
    """
    mbc = mbw * mbh
    lv = levels.astype(np.int64)
    a = np.abs(lv)
    has_y2 = (parts == ARE16X16)

    # first coded position per block: 1 for Y blocks of MBs with Y2
    first = np.zeros((mbc, 25), dtype=np.int32)
    first[:, :16] = has_y2[:, None].astype(np.int32)

    pos = np.arange(16)
    nzmask = a != 0
    considered = pos[None, None, :] >= first[:, :, None]
    nz_considered = nzmask & considered
    # eob position = 1 + last nonzero considered position (or `first` if none)
    last_nz = np.where(np.any(nz_considered, axis=2),
                       15 - np.argmax(nz_considered[:, :, ::-1], axis=2), -1)
    eob_pos = np.where(last_nz >= 0, last_nz + 1, first)

    tok = classify_tokens(lv)
    tok = np.where(pos[None, None, :] == eob_pos[:, :, None], DCT_EOB, tok)
    coded = considered & (pos[None, None, :] <= eob_pos[:, :, None])
    # the Y2 block exists only on 16x16 MBs
    coded[:, 24, :] &= has_y2[:, None]

    # prev token (for skip-first-bit and running ctx3)
    prev_tok = np.full_like(tok, -1)
    prev_tok[:, :, 1:] = tok[:, :, :-1]
    is_first = pos[None, None, :] == first[:, :, None]
    skipfb = (~is_first) & (prev_tok == DCT_0)

    run_ctx = np.where(prev_tok == DCT_0, 0, np.where(prev_tok == DCT_1, 1, 2))
    ctx3_first = third_context(levels, parts, mbw, mbh)
    ctx3 = np.where(is_first, ctx3_first[:, :, None], run_ctx)

    sign = (lv < 0).astype(np.uint8)
    extra = np.where(tok >= 5, a - CAT_BASE[np.clip(tok - 5, 0, 5)], 0)
    extra = np.where(tok < 11, extra, 0)

    # ctx1 per block: Y2 -> 1, chroma -> 2, Y -> 0 if Y2 present else 3
    ctx1 = np.empty((mbc, 25), dtype=np.int32)
    ctx1[:, :16] = np.where(has_y2[:, None], 0, 3)
    ctx1[:, 16:24] = 2
    ctx1[:, 24] = 1

    mb_skip, _ = mb_skip_flags(levels, parts)
    return dict(tok=tok.astype(np.int32), sign=sign, extra=extra.astype(np.int64),
                coded=coded, skipfb=skipfb, ctx3=ctx3.astype(np.int32),
                ctx1=ctx1, first=first, eob_pos=eob_pos, mb_skip=mb_skip)


def mb_skip_flags(levels: np.ndarray, parts: np.ndarray):
    """Per-MB "no coefficients" flag and the non_zero_coeffs sum used for the
    filter mask (reference prepare_filter_mask, CPU_kernels.cl:782-827)."""
    a = np.abs(levels.astype(np.int64))
    has_y2 = (parts == ARE16X16)
    s = a[:, :16, 1:].sum(axis=(1, 2))          # Y AC
    s = s + a[:, 16:24, :].sum(axis=(1, 2))     # chroma
    s = s + np.where(has_y2, a[:, 24, :].sum(axis=1), a[:, :16, 0].sum(axis=1))
    nzc = s.astype(np.int64)
    return nzc == 0, nzc


def emission_order(parts: np.ndarray, skip: np.ndarray, mbw: int, mbh: int,
                   num_partitions: int):
    """Flat (mb, block) emission order per partition.

    Partition p takes MB rows p, p+N, ... (CPU_kernels.cl:368); within an MB:
    Y2 (if present), Y0..15, U0..3, V0..3; skipped MBs omitted.
    Returns list per partition of (mb_idx, block_idx) int arrays."""
    out = []
    has_y2 = (parts == ARE16X16)
    for p in range(num_partitions):
        rows = np.arange(p, mbh, num_partitions)
        mbs = (rows[:, None] * mbw + np.arange(mbw)[None, :]).reshape(-1)
        mbs = mbs[~skip[mbs]]
        blocks = []
        mbi = []
        for m in mbs:
            order = ([24] if has_y2[m] else []) + list(range(24))
            blocks.extend(order)
            mbi.extend([m] * len(order))
        out.append((np.array(mbi, dtype=np.int64),
                    np.array(blocks, dtype=np.int64)))
    return out


def build_token_records(tokdata: dict, order) -> list[np.ndarray]:
    """Flatten tokenized frame into ordered per-partition token records."""
    recs = []
    for mbi, blki in order:
        if len(mbi) == 0:
            recs.append(np.zeros(0, dtype=TOKEN_RECORD_DTYPE))
            continue
        coded = tokdata["coded"][mbi, blki]          # (nblk, 16)
        n_per = coded.sum(axis=1)
        total = int(n_per.sum())
        r = np.zeros(total, dtype=TOKEN_RECORD_DTYPE)
        sel = coded
        posg = np.broadcast_to(np.arange(16), coded.shape)
        r["tok"] = tokdata["tok"][mbi, blki][sel]
        r["ctx1"] = tokdata["ctx1"][mbi, blki][..., None].repeat(16, -1)[sel]
        r["band"] = COEFF_BANDS[posg[sel]]
        r["ctx3"] = tokdata["ctx3"][mbi, blki][sel]
        r["skipfb"] = tokdata["skipfb"][mbi, blki][sel]
        r["sign"] = tokdata["sign"][mbi, blki][sel]
        r["extra"] = tokdata["extra"][mbi, blki][sel]
        recs.append(r)
    return recs


def probs_from_counts(num: np.ndarray, den: np.ndarray, num_partitions: int):
    """Final coefficient probabilities from raw (zeros, bools) counts —
    shared by the numpy and native counting paths."""
    num = num.reshape(-1).astype(np.int64)
    den = den.reshape(-1).astype(np.int64)
    den_total = den + num_partitions
    probs = np.clip((num << 8) // den_total, 1, 255)
    exercised = den >= 1
    probs = np.where(exercised, probs, TBL.DEFAULT_COEFF_PROBS.reshape(-1))
    return (probs.reshape(4, 8, 3, 11).astype(np.uint8),
            exercised.reshape(4, 8, 3, 11))


def count_probs(tokdata: dict, num_partitions: int, mbw: int, mbh: int):
    """Per-context (numerator=zeros, denominator=bools) counts over tree bits,
    merged across partitions; probs = clamp(256*num/denom, 1, 255); contexts
    never exercised (denom < 2 with per-partition init of 1) fall back to the
    defaults (reference vp8enc.cpp:76-83, CPU_kernels.cl:541-778).

    Returns (probs (4,8,3,11) uint8, exercised (4,8,3,11) bool)."""
    # skipped MBs are never coded, so their (EOB-only) blocks must not be
    # counted (reference count_probs skips them, CPU_kernels.cl:578-579)
    coded = tokdata["coded"] & ~tokdata["mb_skip"][:, None, None]
    tok = tokdata["tok"][coded]
    ctx1 = np.broadcast_to(tokdata["ctx1"][:, :, None], coded.shape)[coded]
    band = COEFF_BANDS[np.broadcast_to(np.arange(16), coded.shape)[coded]]
    ctx3 = tokdata["ctx3"][coded]
    skipfb = tokdata["skipfb"][coded].astype(np.int64)

    lens = COEFF_TOKEN_LENS[tok]
    maxlen = 7
    steps = np.arange(maxlen)
    # valid steps, skipping step 0 when the leading ONE is implicit
    valid = (steps[None, :] < lens[:, None]) & (steps[None, :] >= skipfb[:, None])
    nodes = COEFF_TOKEN_NODES[tok]      # (n, 7)
    bits = COEFF_TOKEN_BITS[tok]

    flat_idx = (((ctx1[:, None] * 8 + band[:, None]) * 3 + ctx3[:, None]) * 11
                + nodes)
    # bincount over (idx, bit) pairs is ~10x faster than np.add.at scatters
    NCTX = 4 * 8 * 3 * 11
    pair = flat_idx[valid] * 2 + bits[valid]
    counts = np.bincount(pair, minlength=NCTX * 2)
    zeros_ = counts[0::2]
    ones_ = counts[1::2]
    num = zeros_.astype(np.int64)
    den = (zeros_ + ones_).astype(np.int64)

    # The reference initializes each partition's denominator array to 1, so the
    # merged denominator starts at num_partitions.
    den_total = den + num_partitions
    probs = (num << 8) // den_total
    probs = np.clip(probs, 1, 255)
    # a context is "exercised" when at least one bool was actually coded in it
    exercised = den >= 1
    probs = np.where(exercised, probs, TBL.DEFAULT_COEFF_PROBS.reshape(-1))
    return (probs.reshape(4, 8, 3, 11).astype(np.uint8),
            exercised.reshape(4, 8, 3, 11))


def records_to_bools(records: np.ndarray, probs: np.ndarray):
    """Expand token records to (probs, bits) arrays — numpy fallback path.

    probs: (4,8,3,11) uint8 coefficient probabilities.
    """
    if len(records) == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.uint8)
    tok = records["tok"].astype(np.int64)
    lens = COEFF_TOKEN_LENS[tok]
    skipfb = records["skipfb"].astype(np.int64)
    nodes = COEFF_TOKEN_NODES[tok]
    bits = COEFF_TOKEN_BITS[tok]
    steps = np.arange(7)
    tree_valid = (steps[None, :] < lens[:, None]) & (steps[None, :] >= skipfb[:, None])
    p_flat = probs.reshape(-1)
    flat_idx = (((records["ctx1"].astype(np.int64)[:, None] * 8
                  + records["band"][:, None]) * 3
                 + records["ctx3"][:, None]) * 11 + nodes)
    tree_probs = p_flat[flat_idx]

    # extra bits (categories), MSB-first over CAT_NBITS[tok-5] bits
    is_cat = (tok >= 5) & (tok <= 10)
    cat = np.clip(tok - 5, 0, 5)
    nb = np.where(is_cat, CAT_NBITS[cat], 0)
    esteps = np.arange(11)
    extra_valid = esteps[None, :] < nb[:, None]
    shift = nb[:, None] - 1 - esteps[None, :]
    extra_bits = (records["extra"].astype(np.int64)[:, None]
                  >> np.maximum(shift, 0)) & 1
    extra_probs = PCAT_PROBS[cat]

    has_sign = (tok != DCT_EOB) & (tok != DCT_0)

    # assemble per record: tree bits, extra bits, sign
    n = len(records)
    counts = tree_valid.sum(1) + extra_valid.sum(1) + has_sign.astype(np.int64)
    total = int(counts.sum())
    out_p = np.empty(total, dtype=np.uint8)
    out_b = np.empty(total, dtype=np.uint8)
    # build a (n, 19) staging matrix and flatten by validity mask
    stage_p = np.zeros((n, 19), dtype=np.uint8)
    stage_b = np.zeros((n, 19), dtype=np.uint8)
    stage_v = np.zeros((n, 19), dtype=bool)
    stage_p[:, :7] = np.where(tree_valid, tree_probs, 0)
    stage_b[:, :7] = np.where(tree_valid, bits, 0)
    stage_v[:, :7] = tree_valid
    stage_p[:, 7:18] = np.where(extra_valid, extra_probs, 0)
    stage_b[:, 7:18] = np.where(extra_valid, extra_bits, 0)
    stage_v[:, 7:18] = extra_valid
    stage_p[:, 18] = 128
    stage_b[:, 18] = records["sign"]
    stage_v[:, 18] = has_sign
    out_p = stage_p[stage_v]
    out_b = stage_b[stage_v]
    return out_p, out_b
