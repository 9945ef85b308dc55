"""Find-near-MV census, MV component coding, and per-frame MV prob adaptation.

Parity with /root/reference/src/entropy_host.cpp:125-706 (which follows the
RFC 6386 §16.3 / dixie `find_near_mvs`): the census is a pure function of the
neighbors' final (is_inter, parts, mv[3]) state, so it is fully vectorized
here; only the serial bool emission consumes its results.

MVs are (x, y) in luma quarter-pel; the bitstream codes y (row) first.
"""
from __future__ import annotations

import numpy as np

from vp8oclenc_tpu import tables as TBL
from vp8oclenc_tpu.tables import (ARE16X16, MVP_BITS, MVP_IS_SHORT, MVP_SHORT,
                                  MVP_SIGN, MV_LONG_WIDTH, SMALL_MV_TREE,
                                  VP8_MODE_CONTEXTS)

# Tree paths for the 8 short MV magnitudes under SMALL_MV_TREE.
SHORT_MV_NODES, SHORT_MV_BITS, SHORT_MV_LENS = TBL.tree_paths(SMALL_MV_TREE, 8, 3)


def _pack(mv_xy: np.ndarray) -> np.ndarray:
    """Pack (..., 2) int16 mv into a single comparable int64 (x | y<<16)."""
    x = mv_xy[..., 0].astype(np.int64) & 0xFFFF
    y = mv_xy[..., 1].astype(np.int64) & 0xFFFF
    return x | (y << 16)


def find_near_mvs(base_mv: np.ndarray, is_inter: np.ndarray, parts: np.ndarray,
                  mbw: int, mbh: int):
    """Vectorized census over all MBs.

    base_mv: (mbc, 2) int (x, y) — each MB's vector[3]; is_inter: (mbc,) bool;
    parts: (mbc,).

    Returns dict with per-MB: best (mbc,2), nearest (mbc,2), near (mbc,2),
    mode_probs (mbc,4) for the mv_ref tree.
    """
    mbc = mbw * mbh
    grid = lambda a: a.reshape(mbh, mbw, *a.shape[1:])

    raw = _pack(base_mv)
    g_raw, g_int, g_parts = grid(raw), grid(is_inter), grid(parts)

    def neighbor(g, dy, dx, fill):
        out = np.full_like(g, fill)
        ys = slice(dy, None) if dy else slice(None)
        yd = slice(None, -dy) if dy else slice(None)
        xs = slice(dx, None) if dx else slice(None)
        xd = slice(None, -dx) if dx else slice(None)
        out[ys, xs] = g[yd, xd]
        return out

    a_raw = neighbor(g_raw, 1, 0, 0).reshape(mbc)
    a_int = neighbor(g_int.astype(np.int64), 1, 0, 0).reshape(mbc).astype(bool)
    a_split = neighbor((g_parts != ARE16X16).astype(np.int64), 1, 0, 0).reshape(mbc).astype(bool)
    l_raw = neighbor(g_raw, 0, 1, 0).reshape(mbc)
    l_int = neighbor(g_int.astype(np.int64), 0, 1, 0).reshape(mbc).astype(bool)
    l_split = neighbor((g_parts != ARE16X16).astype(np.int64), 0, 1, 0).reshape(mbc).astype(bool)
    al_raw = neighbor(neighbor(g_raw, 1, 0, 0), 0, 1, 0).reshape(mbc)
    al_int = neighbor(neighbor(g_int.astype(np.int64), 1, 0, 0), 0, 1, 0).reshape(mbc).astype(bool)
    al_split = neighbor(neighbor((g_parts != ARE16X16).astype(np.int64), 1, 0, 0),
                        0, 1, 0).reshape(mbc).astype(bool)

    z = np.zeros(mbc, dtype=np.int64)
    mv1, mv2, mv3 = z.copy(), z.copy(), z.copy()
    cnt0, cnt1, cnt2, cnt3 = (np.zeros(mbc, dtype=np.int64) for _ in range(4))
    ptr = np.zeros(mbc, dtype=np.int64)

    # above (weight 2)
    a_nz = a_int & (a_raw != 0)
    mv1 = np.where(a_nz, a_raw, mv1)
    ptr = np.where(a_nz, 1, ptr)
    cnt1 += 2 * a_nz
    cnt0 += 2 * (a_int & ~a_nz)

    # left (weight 2)
    l_nz = l_int & (l_raw != 0)
    cur_top = np.where(ptr == 1, mv1, 0)
    l_new = l_nz & (l_raw != cur_top)
    # new entry goes to ptr+1
    mv1 = np.where(l_new & (ptr == 0), l_raw, mv1)
    mv2 = np.where(l_new & (ptr == 1), l_raw, mv2)
    cnt1 += 2 * (l_new & (ptr == 0))
    cnt2 += 2 * (l_new & (ptr == 1))
    cnt1 += 2 * (l_nz & ~l_new)          # equal to current top (top is entry 1)
    ptr = ptr + l_new
    cnt0 += 2 * (l_int & ~l_nz)

    # above-left (weight 1)
    al_nz = al_int & (al_raw != 0)
    cur_top = np.where(ptr == 2, mv2, np.where(ptr == 1, mv1, 0))
    al_new = al_nz & (al_raw != cur_top)
    mv1 = np.where(al_new & (ptr == 0), al_raw, mv1)
    mv2 = np.where(al_new & (ptr == 1), al_raw, mv2)
    mv3 = np.where(al_new & (ptr == 2), al_raw, mv3)
    cnt1 += 1 * (al_new & (ptr == 0))
    cnt2 += 1 * (al_new & (ptr == 1))
    cnt3 += 1 * (al_new & (ptr == 2))
    cnt1 += 1 * (al_nz & ~al_new & (ptr == 1))
    cnt2 += 1 * (al_nz & ~al_new & (ptr == 2))
    ptr = ptr + al_new
    cnt0 += 1 * (al_int & ~al_nz)

    # merge an above-left third entry equal to NEAREST (entry was deduped only
    # against the top of the list)
    cnt1 += (cnt3 > 0) & (mv3 == mv1)

    # SPLITMV census
    cnt3 = ((a_int & a_split).astype(np.int64)
            + (l_int & l_split)) * 2 + (al_int & al_split)

    # sort nearest/near
    swap = cnt2 > cnt1
    mv1, mv2 = np.where(swap, mv2, mv1), np.where(swap, mv1, mv2)
    cnt1, cnt2 = np.where(swap, cnt2, cnt1), np.where(swap, cnt1, cnt2)

    best = np.where(cnt1 >= cnt0, mv1, 0)

    mode_probs = np.stack([
        VP8_MODE_CONTEXTS[cnt0, 0], VP8_MODE_CONTEXTS[cnt1, 1],
        VP8_MODE_CONTEXTS[cnt2, 2], VP8_MODE_CONTEXTS[cnt3, 3]], axis=1)

    def unpack(p):
        x = (p & 0xFFFF).astype(np.int64)
        x = np.where(x >= 0x8000, x - 0x10000, x)
        y = ((p >> 16) & 0xFFFF).astype(np.int64)
        y = np.where(y >= 0x8000, y - 0x10000, y)
        return np.stack([x, y], axis=1).astype(np.int32)

    return dict(best=unpack(best), nearest=unpack(mv1), near=unpack(mv2),
                nearest_raw=mv1, near_raw=mv2, best_raw=best,
                mode_probs=mode_probs.astype(np.uint8))


def mv_component_bools(v: int, probs: np.ndarray):
    """(probs, bits) lists for one MV component (§17.2; write_mv,
    entropy_host.cpp:125-207).  v: signed component; probs: (19,) uint8."""
    out_p, out_b = [], []
    a = abs(int(v))
    if a <= 7:
        out_p.append(probs[MVP_IS_SHORT]); out_b.append(0)
        for s in range(int(SHORT_MV_LENS[a])):
            out_p.append(probs[MVP_SHORT + SHORT_MV_NODES[a, s]])
            out_b.append(int(SHORT_MV_BITS[a, s]))
        if a != 0:
            out_p.append(probs[MVP_SIGN]); out_b.append(1 if v < 0 else 0)
    else:
        out_p.append(probs[MVP_IS_SHORT]); out_b.append(1)
        for i in range(3):
            out_p.append(probs[MVP_BITS + i]); out_b.append((a >> i) & 1)
        for i in range(MV_LONG_WIDTH - 1, 3, -1):
            out_p.append(probs[MVP_BITS + i]); out_b.append((a >> i) & 1)
        if a & 0xFFF0:
            out_p.append(probs[MVP_BITS + 3]); out_b.append((a >> 3) & 1)
        out_p.append(probs[MVP_SIGN]); out_b.append(1 if v < 0 else 0)
    return out_p, out_b


def count_mv_components(deltas: np.ndarray):
    """Accumulate (num_zero_bits, num_bits) per context over all NEW-MV deltas
    (count_mv, entropy_host.cpp:445-540).  deltas: (n, 2) int (x, y).

    Returns (num (2,19), denom (2,19)) with denom initialized to 1."""
    num = np.zeros((2, 19), dtype=np.int64)
    den = np.ones((2, 19), dtype=np.int64)
    for comp, col in ((1, 0), (0, 1)):   # y uses context row 0, x row 1
        vs = deltas[:, comp]
        for v in vs:
            a = abs(int(v))
            den[col, MVP_IS_SHORT] += 1
            if a <= 7:
                num[col, MVP_IS_SHORT] += 1
                for s in range(int(SHORT_MV_LENS[a])):
                    idx = MVP_SHORT + int(SHORT_MV_NODES[a, s])
                    num[col, idx] += 1 - int(SHORT_MV_BITS[a, s])
                    den[col, idx] += 1
                if a != 0:
                    num[col, MVP_SIGN] += int(v > 0)
                    den[col, MVP_SIGN] += 1
            else:
                for i in range(3):
                    num[col, MVP_BITS + i] += 1 - ((a >> i) & 1)
                    den[col, MVP_BITS + i] += 1
                for i in range(MV_LONG_WIDTH - 1, 3, -1):
                    num[col, MVP_BITS + i] += 1 - ((a >> i) & 1)
                    den[col, MVP_BITS + i] += 1
                if a & 0xFFF0:
                    num[col, MVP_BITS + 3] += 1 - ((a >> 3) & 1)
                    den[col, MVP_BITS + 3] += 1
                num[col, MVP_SIGN] += int(v > 0)
                den[col, MVP_SIGN] += 1
    return num, den


def adapt_mv_probs(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """New MV context probs: (num<<8)/denom, LSB cleared (7-bit storage),
    clamped to 2..254 (entropy_host.cpp:1043-1055)."""
    p = ((num << 8) // den).astype(np.int64) & 0xFF
    p &= ~1
    return np.clip(p, 2, 254).astype(np.uint8)
