"""Segment quantizer / loop-filter-strength controller.

Parity with prepare_segments_data / get_loopfilter_strength
(/root/reference/src/vp8enc.cpp:96-229): 4 segment quantizer ladders, loop
filter level derived from y_dc_q and frame brightness, interior/edge limits
and HEV thresholds exactly as the decoder re-derives them (RFC 6386 §15.2).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from vp8oclenc_tpu.tables import AC_QLOOKUP, DC_QLOOKUP, SEGMENT_COUNT
from vp8oclenc_tpu.config import EncoderConfig


@dataclass
class SegmentData:
    """Per-frame segment state (4 segments)."""
    y_ac_i: np.ndarray          # (4,) quantizer index per segment (written to header)
    y_dc_idelta: int
    y2_dc_idelta: int
    y2_ac_idelta: int
    uv_dc_idelta: int
    uv_ac_idelta: int
    loop_filter_level: np.ndarray   # (4,)
    sharpness: int
    # derived quantizer values
    y_dc_q: np.ndarray = field(default=None)
    y_ac_q: np.ndarray = field(default=None)
    y2_dc_q: np.ndarray = field(default=None)
    y2_ac_q: np.ndarray = field(default=None)
    uv_dc_q: np.ndarray = field(default=None)
    uv_ac_q: np.ndarray = field(default=None)
    # derived filter limits (decoder re-derives these identically)
    interior_limit: np.ndarray = field(default=None)
    mbedge_limit: np.ndarray = field(default=None)
    sub_bedge_limit: np.ndarray = field(default=None)
    hev_threshold: np.ndarray = field(default=None)
    # raw (pre-weaken) frame strength, reusable by same-frame re-derivations
    raw_strength: tuple = field(default=None)


def _clamp_qi(qi):
    return np.clip(qi, 0, 127)


def derive_quantizers(y_ac_i: np.ndarray, y_dc_idelta: int, y2_dc_idelta: int,
                      y2_ac_idelta: int, uv_dc_idelta: int, uv_ac_idelta: int):
    """Quantizer values from indices, with the VP8 y2/uv adjustments
    (RFC 6386 §14.1; reference vp8enc.cpp:164-185)."""
    y_ac_i = np.asarray(y_ac_i, dtype=np.int32)
    y_ac_q = AC_QLOOKUP[y_ac_i]
    y_dc_q = DC_QLOOKUP[_clamp_qi(y_ac_i + y_dc_idelta)]
    y2_dc_q = DC_QLOOKUP[_clamp_qi(y_ac_i + y2_dc_idelta)] * 2
    y2_ac_q = np.maximum(31 * AC_QLOOKUP[_clamp_qi(y_ac_i + y2_ac_idelta)] // 20, 8)
    uv_dc_q = np.minimum(DC_QLOOKUP[_clamp_qi(y_ac_i + uv_dc_idelta)], 132)
    uv_ac_q = AC_QLOOKUP[_clamp_qi(y_ac_i + uv_ac_idelta)]
    return y_dc_q, y_ac_q, y2_dc_q, y2_ac_q, uv_dc_q, uv_ac_q


def derive_filter_limits(level: np.ndarray, sharpness: int, is_key: bool):
    """Limits/thresholds from the loop filter level exactly as a decoder
    derives them (RFC 6386 §15.2; reference vp8enc.cpp:192-220)."""
    level = np.asarray(level, dtype=np.int32)
    interior = level.copy()
    if sharpness:
        interior >>= 2 if sharpness > 4 else 1
        interior = np.minimum(interior, 9 - sharpness)
    interior = np.maximum(interior, 1)
    mbedge = ((level + 2) * 2) + interior
    sub_bedge = (level * 2) + interior
    if is_key:
        hev = np.where(level >= 40, 2, np.where(level >= 15, 1, 0))
    else:
        hev = np.where(level >= 40, 3,
                       np.where(level >= 20, 2, np.where(level >= 15, 1, 0)))
    return interior, mbedge, sub_bedge, hev


def loopfilter_strength(current_y: np.ndarray):
    """(reductor, sharpness) from frame brightness average and local variance
    (reference get_loopfilter_strength, vp8enc.cpp:96-127).

    Delegates to the native single-pass implementation when built (~1-2 ms
    vs ~14 ms for the numpy passes at 1080p, on the per-frame hot path);
    both are exact and tests/test_native_entropy.py asserts parity."""
    try:
        from vp8oclenc_tpu.native import packer as native
        if native.available():
            return native.frame_strength(current_y)
    except Exception:
        pass
    return _loopfilter_strength_numpy(current_y)


def _loopfilter_strength_numpy(current_y: np.ndarray):
    y = current_y.astype(np.int32)
    n = y.size
    avg = int((int(y.sum(dtype=np.int64)) + n // 2) // n)
    reductor = (avg * 5 // 255) + 3

    # 8-neighborhood mean at interior pixels, C-style truncating /8 on a
    # non-negative sum.
    s = (y[:-2, :-2] + y[:-2, 1:-1] + y[:-2, 2:] +
         y[1:-1, :-2] + y[1:-1, 2:] +
         y[2:, :-2] + y[2:, 1:-1] + y[2:, 2:]) // 8
    d = y[1:-1, 1:-1] - s
    d *= d
    h, w = y.shape
    denom = (h - 1) * (w - 1)
    div = int((int(d.sum(dtype=np.int64)) + denom // 2) // denom)
    sharpness = min(div // 8, 7)
    return reductor, sharpness


def prepare_segments(cfg: EncoderConfig, current_y: np.ndarray, is_key: bool,
                     is_altref: bool, weaken_filter: bool = False,
                     strength: tuple = None) -> SegmentData:
    """Build the per-frame 4-segment quantizer/filter state
    (reference prepare_segments_data, vp8enc.cpp:129-229).

    strength: optional (reductor, sharpness) computed earlier for the same
    frame (loopfilter_strength is two full-frame passes; re-derivations for
    weaken/redo reuse it via SegmentData.raw_strength)."""
    y_dc_idelta = 15
    y2_dc_idelta = 0
    y2_ac_idelta = 0
    uv_dc_idelta = 0 if is_key else -15
    uv_ac_idelta = 0 if is_key else -15

    if is_key:
        y_ac_i = np.full(SEGMENT_COUNT, cfg.qi_min, dtype=np.int32)
    elif is_altref:
        y_ac_i = np.asarray(cfg.altrefqi, dtype=np.int32)
    else:
        y_ac_i = np.asarray(cfg.lastqi, dtype=np.int32)

    reductor, sharpness = strength if strength is not None \
        else loopfilter_strength(current_y)
    raw = (reductor, sharpness)
    if weaken_filter:
        # reference check_SSIM: min SSIM > 0.95 -> halve the level, sharpness 7
        reductor *= 2
        sharpness = 7

    qs = derive_quantizers(y_ac_i, y_dc_idelta, y2_dc_idelta, y2_ac_idelta,
                           uv_dc_idelta, uv_ac_idelta)
    y_dc_q, y_ac_q, y2_dc_q, y2_ac_q, uv_dc_q, uv_ac_q = qs

    level = np.clip(y_dc_q // reductor, 0, 63).astype(np.int32)
    interior, mbedge, sub_bedge, hev = derive_filter_limits(level, sharpness, is_key)

    return SegmentData(
        y_ac_i=y_ac_i, y_dc_idelta=y_dc_idelta, y2_dc_idelta=y2_dc_idelta,
        y2_ac_idelta=y2_ac_idelta, uv_dc_idelta=uv_dc_idelta,
        uv_ac_idelta=uv_ac_idelta, loop_filter_level=level, sharpness=sharpness,
        y_dc_q=y_dc_q, y_ac_q=y_ac_q, y2_dc_q=y2_dc_q, y2_ac_q=y2_ac_q,
        uv_dc_q=uv_dc_q, uv_ac_q=uv_ac_q,
        interior_limit=interior, mbedge_limit=mbedge,
        sub_bedge_limit=sub_bedge, hev_threshold=hev, raw_strength=raw)
