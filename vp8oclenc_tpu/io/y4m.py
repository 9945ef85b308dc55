"""YUV4MPEG2 reader/writer and MB-alignment padding.

Parity with the reference demuxer (/root/reference/src/init.h:1610-1737,
encIO.h:141-254): parses W/H/F fields, supports '@' = stdin, pads frames up to
a multiple of 16 by edge replication.  The reference's V-plane padding bug
(encIO.h:177-179 pads V with U pixels) is intentionally NOT reproduced.
"""
from __future__ import annotations

import io
import sys
from dataclasses import dataclass
from typing import BinaryIO, Iterator, Optional

import numpy as np


@dataclass
class Y4MInfo:
    width: int
    height: int
    fps_num: int = 30
    fps_den: int = 1

    @property
    def framerate(self) -> int:
        return (self.fps_num + self.fps_den // 2) // max(1, self.fps_den)


@dataclass
class Frame:
    """One I420 frame. y: (H, W) uint8; u, v: (H/2, W/2) uint8."""
    y: np.ndarray
    u: np.ndarray
    v: np.ndarray

    @property
    def width(self) -> int:
        return self.y.shape[1]

    @property
    def height(self) -> int:
        return self.y.shape[0]


class Y4MReader:
    def __init__(self, source) -> None:
        if isinstance(source, (str,)):
            if source == "@":
                self.fh: BinaryIO = sys.stdin.buffer
            else:
                self.fh = open(source, "rb")
        elif isinstance(source, (bytes, bytearray)):
            self.fh = io.BytesIO(source)
        else:
            self.fh = source
        self.info = self._parse_header()

    def _parse_header(self) -> Y4MInfo:
        line = self.fh.readline()
        if not line.startswith(b"YUV4MPEG2"):
            raise ValueError("not a YUV4MPEG2 stream")
        width = height = 0
        fps_num, fps_den = 30, 1
        for tok in line.split()[1:]:
            if tok[:1] == b"W":
                width = int(tok[1:])
            elif tok[:1] == b"H":
                height = int(tok[1:])
            elif tok[:1] == b"F":
                num, den = tok[1:].split(b":")
                fps_num, fps_den = int(num), int(den)
            elif tok[:1] == b"C" and not tok[1:].startswith(b"420"):
                raise ValueError(f"only 4:2:0 supported, got {tok!r}")
        if width <= 0 or height <= 0:
            raise ValueError("missing W/H in y4m header")
        return Y4MInfo(width, height, fps_num, fps_den)

    def __iter__(self) -> Iterator[Frame]:
        return self

    def __next__(self) -> Frame:
        f = self.read_frame()
        if f is None:
            raise StopIteration
        return f

    def read_frame(self) -> Optional[Frame]:
        line = self.fh.readline()
        if not line:
            return None
        if not line.startswith(b"FRAME"):
            raise ValueError(f"broken y4m stream: {line[:16]!r}")
        w, h = self.info.width, self.info.height
        n = w * h + 2 * ((w // 2) * (h // 2))
        raw = self.fh.read(n)
        if len(raw) < n:
            return None
        buf = np.frombuffer(raw, dtype=np.uint8)
        y = buf[: w * h].reshape(h, w)
        u = buf[w * h: w * h + (w // 2) * (h // 2)].reshape(h // 2, w // 2)
        v = buf[w * h + (w // 2) * (h // 2):].reshape(h // 2, w // 2)
        return Frame(y, u, v)


class Y4MWriter:
    def __init__(self, fh: BinaryIO, width: int, height: int,
                 fps_num: int = 30, fps_den: int = 1) -> None:
        self.fh = fh
        fh.write(f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} Ip A1:1 C420mpeg2\n".encode())

    def write_frame(self, frame: Frame) -> None:
        self.fh.write(b"FRAME\n")
        self.fh.write(frame.y.tobytes())
        self.fh.write(frame.u.tobytes())
        self.fh.write(frame.v.tobytes())


def pad16(x: int) -> int:
    return (x + 15) & ~15


def _pad_plane(p: np.ndarray, wrk_h: int, wrk_w: int) -> np.ndarray:
    h, w = p.shape
    if (h, w) == (wrk_h, wrk_w):
        return p
    out = np.empty((wrk_h, wrk_w), dtype=p.dtype)
    out[:h, :w] = p
    if w < wrk_w:
        out[:h, w:] = p[:, w - 1:w]
    if h < wrk_h:
        out[h:, :] = out[h - 1:h, :]
    return out


def pad_frame(frame: Frame) -> Frame:
    """Pad to a multiple of 16 (luma) by edge replication."""
    wrk_w, wrk_h = pad16(frame.width), pad16(frame.height)
    return Frame(
        _pad_plane(frame.y, wrk_h, wrk_w),
        _pad_plane(frame.u, wrk_h // 2, wrk_w // 2),
        _pad_plane(frame.v, wrk_h // 2, wrk_w // 2),
    )


def crop_frame(frame: Frame, width: int, height: int) -> Frame:
    return Frame(frame.y[:height, :width],
                 frame.u[: height // 2, : width // 2],
                 frame.v[: height // 2, : width // 2])
