"""ctypes bindings for the native range-coder packer (auto-built with g++).

Falls back gracefully (available() -> False) when no toolchain exists; the
pure-Python coder in entropy/boolcoder.py then takes over.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "packer.cpp")
_SRC2 = os.path.join(_HERE, "tokenizer.cpp")
_SRC3 = os.path.join(_HERE, "headers.cpp")
_SRC4 = os.path.join(_HERE, "strength.cpp")
_SO = os.path.join(_HERE, "_packer.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC2),
                        os.path.getmtime(_SRC3), os.path.getmtime(_SRC4))
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_mtime:
            return True
        with tempfile.TemporaryDirectory() as td:
            tmp = os.path.join(td, "_packer.so")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC, _SRC2,
                 _SRC3, _SRC4],
                check=True, capture_output=True)
            os.replace(tmp, _SO)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.vp8_pack_bools.restype = ctypes.c_size_t
    lib.vp8_pack_bools.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_size_t, ctypes.c_void_p]
    lib.vp8_tokenize_frame.restype = None
    lib.vp8_tokenize_frame.argtypes = [ctypes.c_void_p] * 2 + \
        [ctypes.c_int] * 3 + [ctypes.c_void_p, ctypes.c_int64] + \
        [ctypes.c_void_p] * 4 + [ctypes.c_void_p] * 3
    lib.vp8_pack_tokens.restype = ctypes.c_size_t
    lib.vp8_pack_tokens.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                    ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_void_p]
    lib.vp8_frame_strength.restype = None
    lib.vp8_frame_strength.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_void_p]
    lib.vp8_mb_headers.restype = ctypes.c_int64
    lib.vp8_mb_headers.argtypes = [ctypes.c_int] * 4 + \
        [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int] + \
        [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p] + \
        [ctypes.c_int] * 3 + [ctypes.c_void_p] * 13 + \
        [ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def pack_bools(probs: np.ndarray, bits: np.ndarray) -> bytes:
    lib = _load()
    n = len(probs)
    out = np.empty(n // 8 + 64 + n // 4, dtype=np.uint8)
    probs = np.ascontiguousarray(probs, dtype=np.uint8)
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    ln = lib.vp8_pack_bools(probs.ctypes.data, bits.ctypes.data, n,
                            out.ctypes.data)
    return out[:ln].tobytes()


def frame_strength(y: np.ndarray):
    """(reductor, sharpness) of a (h, w) uint8 luma plane — exact
    counterpart of pipeline/segments.loopfilter_strength."""
    lib = _load()
    y = np.ascontiguousarray(y, dtype=np.uint8)
    out = np.zeros(2, dtype=np.int32)
    lib.vp8_frame_strength(y.ctypes.data, y.shape[0], y.shape[1],
                           out.ctypes.data)
    return int(out[0]), int(out[1])


def pack_tokens(records: np.ndarray, probs: np.ndarray) -> bytes:
    """records: TOKEN_RECORD_DTYPE array; probs: (4,8,3,11) uint8."""
    from vp8oclenc_tpu import tables as TBL
    from vp8oclenc_tpu.entropy.tokens import PCAT_PROBS

    lib = _load()
    n = len(records)
    # worst case ~ (7 tree + 11 extra + 1 sign) bools/record -> < 3 bytes
    out = np.empty(n * 3 + 64, dtype=np.uint8)
    recs = np.ascontiguousarray(records)
    probs = np.ascontiguousarray(probs, dtype=np.uint8)
    nodes = np.ascontiguousarray(TBL.COEFF_TOKEN_NODES, dtype=np.int32)
    bits = np.ascontiguousarray(TBL.COEFF_TOKEN_BITS, dtype=np.int32)
    lens = np.ascontiguousarray(TBL.COEFF_TOKEN_LENS, dtype=np.int32)
    pcat = np.ascontiguousarray(PCAT_PROBS, dtype=np.uint8)
    nbits = np.ascontiguousarray(TBL.CAT_NBITS, dtype=np.int32)
    ln = lib.vp8_pack_tokens(recs.ctypes.data, n, probs.ctypes.data,
                             nodes.ctypes.data, bits.ctypes.data,
                             lens.ctypes.data, pcat.ctypes.data,
                             nbits.ctypes.data, out.ctypes.data)
    return out[:ln].tobytes()


def mb_headers(phase: int, fd, seg_probs, skip_prob: int,
               prob_intra: int, prob_last: int, prob_gf: int,
               census, new_mv_probs, ymode_probs, uvmode_probs):
    """Native per-MB header bool emission / NEW-MV statistics.

    phase 0: returns (num, den) (2,19) int64 MV-component counts.
    phase 1: returns (probs, bits) uint8 arrays of the emitted bool stream.
    """
    from vp8oclenc_tpu import tables as TBL

    lib = _load()
    mbc = fd.mbw * fd.mbh
    c = lambda a, dt: np.ascontiguousarray(a, dtype=dt)
    ptr = lambda a: a.ctypes.data if a is not None else None

    seg_ids = c(fd.segment_ids, np.int32)
    has_seg = seg_probs is not None
    segp = c(seg_probs, np.uint8) if has_seg else None
    skip = c(fd.skip, np.uint8)
    is_inter = c(fd.is_inter, np.uint8)
    ref = c(fd.ref_frame, np.int32)
    parts = c(fd.parts, np.int32)
    mvs = c(fd.mvs, np.int16)
    modes = c(fd.modes, np.int32)
    if census is not None:
        mode_probs = c(census["mode_probs"], np.uint8)
        nearest = c(census["nearest_raw"], np.int64)
        near = c(census["near_raw"], np.int64)
        best = c(census["best"], np.int32)
    else:
        mode_probs = np.zeros((mbc, 4), dtype=np.uint8)
        nearest = np.zeros(mbc, dtype=np.int64)
        near = np.zeros(mbc, dtype=np.int64)
        best = np.zeros((mbc, 2), dtype=np.int32)
    nmp = c(new_mv_probs if new_mv_probs is not None
            else TBL.DEFAULT_MV_CONTEXT, np.uint8)
    kfb = c(TBL.KF_BMODE_PROB, np.uint8)
    ymp = c(ymode_probs, np.uint8)
    uvp = c(uvmode_probs, np.uint8)
    if phase == 1:
        out_p = np.empty(mbc * 192, dtype=np.uint8)
        out_b = np.empty(mbc * 192, dtype=np.uint8)
    else:
        out_p = out_b = np.empty(0, dtype=np.uint8)
    num = np.zeros((2, 19), dtype=np.int64)
    den = np.ones((2, 19), dtype=np.int64)
    n = lib.vp8_mb_headers(
        phase, fd.mbw, fd.mbh, int(fd.is_key),
        ptr(seg_ids), ptr(segp), int(has_seg),
        ptr(skip), int(skip_prob),
        ptr(is_inter), ptr(ref),
        int(prob_intra or 0), int(prob_last or 0), int(prob_gf or 0),
        ptr(parts), ptr(mvs), ptr(modes), ptr(mode_probs),
        ptr(nearest), ptr(near), ptr(best), ptr(nmp), ptr(kfb),
        ptr(ymp), ptr(uvp), ptr(out_p), ptr(out_b), len(out_p),
        ptr(num), ptr(den))
    if n < 0:
        raise OverflowError("vp8_mb_headers: bool stream exceeded capacity")
    if phase == 1:
        return out_p[:n], out_b[:n]
    return num, den


def tokenize_frame(levels: np.ndarray, parts: np.ndarray, mbw: int, mbh: int,
                   nparts: int):
    """Full-frame tokenization in C++.

    Returns (records list per partition, num (4,8,3,11) int64,
    den (4,8,3,11) int64, skip (mbc,) bool)."""
    from vp8oclenc_tpu import tables as TBL
    from vp8oclenc_tpu.entropy.tokens import TOKEN_RECORD_DTYPE

    lib = _load()
    mbc = mbw * mbh
    rows_per_part = -(-mbh // nparts)
    stride = rows_per_part * mbw * 400
    rec = np.zeros(nparts * stride, dtype=TOKEN_RECORD_DTYPE)
    counts = np.zeros(nparts, dtype=np.int64)
    num = np.zeros(4 * 8 * 3 * 11, dtype=np.int64)
    den = np.zeros(4 * 8 * 3 * 11, dtype=np.int64)
    skip = np.zeros(mbc, dtype=np.uint8)
    levels = np.ascontiguousarray(levels, dtype=np.int16)
    parts = np.ascontiguousarray(parts, dtype=np.int32)
    nodes = np.ascontiguousarray(TBL.COEFF_TOKEN_NODES, dtype=np.int32)
    bits = np.ascontiguousarray(TBL.COEFF_TOKEN_BITS, dtype=np.int32)
    lens = np.ascontiguousarray(TBL.COEFF_TOKEN_LENS, dtype=np.int32)
    lib.vp8_tokenize_frame(
        levels.ctypes.data, parts.ctypes.data, mbw, mbh, nparts,
        rec.ctypes.data, stride, counts.ctypes.data,
        num.ctypes.data, den.ctypes.data, skip.ctypes.data,
        nodes.ctypes.data, bits.ctypes.data, lens.ctypes.data)
    records = [rec[p * stride: p * stride + counts[p]] for p in range(nparts)]
    return (records, num.reshape(4, 8, 3, 11), den.reshape(4, 8, 3, 11),
            skip.astype(bool))
