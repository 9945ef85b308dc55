"""VP8 boolean (binary range) coder — RFC 6386 §7/§8.

The encoder is the only inherently serial stage of the whole pipeline, so the
framework funnels *all* bitstream bits through a single uniform representation:
flat arrays of (probability, bit) pairs.  Those arrays are produced vectorized
(on TPU for coefficients, numpy for headers) and then packed to bytes either by
the native C++ packer (vp8oclenc_tpu.native) or by the pure-Python fallback
below.

Behavior matches the reference coder (/root/reference/src/entropy_host.cpp:20-110
and CPU_kernels.cl:65-147): carry propagation by walking back over 0xFF bytes,
24-bit initial shift register, 4-byte zero-padded flush.
"""
from __future__ import annotations

import numpy as np


class BoolEncoder:
    """Incremental VP8 bool encoder (pure Python)."""

    __slots__ = ("buf", "range", "bottom", "bit_count")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def put(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):  # carry
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.buf.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def _carry(self) -> None:
        i = len(self.buf) - 1
        while i >= 0 and self.buf[i] == 255:
            self.buf[i] = 0
            i -= 1
        assert i >= 0, "carry before first byte"
        self.buf[i] += 1

    def put_many(self, probs, bits) -> None:
        probs = np.asarray(probs).reshape(-1)
        bits = np.asarray(bits).reshape(-1)
        for p, b in zip(probs.tolist(), bits.tolist()):
            self.put(p, b)

    def put_flag(self, bit: int) -> None:
        self.put(128, 1 if bit else 0)

    def put_literal(self, value: int, size: int) -> None:
        for s in range(size - 1, -1, -1):
            self.put_flag((value >> s) & 1)

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.buf.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.buf)


class BoolRecorder:
    """Records a (prob, bit) stream instead of encoding it.

    Same put/put_flag/put_literal surface as BoolEncoder, so header writers
    are agnostic; the collected arrays are packed once by pack_bools (native
    C++ when available).  put_arrays appends pre-vectorized streams (e.g. the
    native per-MB header coder's output) without Python-loop cost.
    """

    __slots__ = ("_p", "_b", "_chunks")

    def __init__(self) -> None:
        self._p = []
        self._b = []
        self._chunks = []

    def put(self, prob: int, bit: int) -> None:
        self._p.append(prob)
        self._b.append(1 if bit else 0)

    def put_flag(self, bit: int) -> None:
        self.put(128, 1 if bit else 0)

    def put_literal(self, value: int, size: int) -> None:
        for s in range(size - 1, -1, -1):
            self.put_flag((value >> s) & 1)

    def put_arrays(self, probs, bits) -> None:
        self._flush_scalars()
        self._chunks.append((np.asarray(probs, dtype=np.uint8).reshape(-1),
                             np.asarray(bits, dtype=np.uint8).reshape(-1)))

    def _flush_scalars(self) -> None:
        if self._p:
            self._chunks.append((np.array(self._p, dtype=np.uint8),
                                 np.array(self._b, dtype=np.uint8)))
            self._p = []
            self._b = []

    def arrays(self):
        self._flush_scalars()
        if not self._chunks:
            z = np.zeros(0, dtype=np.uint8)
            return z, z
        return (np.concatenate([c[0] for c in self._chunks]),
                np.concatenate([c[1] for c in self._chunks]))

    def pack(self) -> bytes:
        return pack_bools(*self.arrays())


def pack_bools(probs: np.ndarray, bits: np.ndarray) -> bytes:
    """Pack a (prob, bit) stream into a flushed VP8 bool partition.

    Uses the native C++ packer when available; falls back to Python.
    """
    probs = np.ascontiguousarray(probs, dtype=np.uint8).reshape(-1)
    bits = np.ascontiguousarray(bits, dtype=np.uint8).reshape(-1)
    try:
        from vp8oclenc_tpu.native import packer as _native
    except Exception:
        _native = None
    if _native is not None and _native.available():
        return _native.pack_bools(probs, bits)
    enc = BoolEncoder()
    enc.put_many(probs, bits)
    return enc.flush()


class BoolDecoder:
    """VP8 bool decoder (RFC 6386 §7.3) — the oracle side of round-trip tests."""

    __slots__ = ("data", "pos", "range", "value", "bit_count")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 2
        self.range = 255
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.bit_count = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.range -= split
            self.value -= big_split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                self.value |= nxt
                self.pos += 1
        return ret

    def get_flag(self) -> int:
        return self.get(128)

    def get_literal(self, size: int) -> int:
        v = 0
        for _ in range(size):
            v = (v << 1) | self.get_flag()
        return v

    def get_signed_literal(self, size: int) -> int:
        v = self.get_literal(size)
        if self.get_flag():
            v = -v
        return v

    def get_tree(self, tree: np.ndarray, probs, start: int = 0) -> int:
        i = start
        while True:
            b = self.get(int(probs[i >> 1]))
            i = int(tree[i + b])
            if i <= 0:
                return -i
