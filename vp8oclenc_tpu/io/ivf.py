"""IVF container muxer/demuxer.

Mirrors the reference muxer behavior (/root/reference/src/encIO.h:32-139):
32-byte DKIF header rewritten at EOF with the true frame count, 12-byte
little-endian per-frame header (size + 64-bit timestamp).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import BinaryIO, Iterator


IVF_HEADER_FMT = "<4sHH4sHHIIII"
IVF_HEADER_SIZE = 32
IVF_FRAME_HEADER_SIZE = 12


def ivf_header(width: int, height: int, framerate: int, timescale: int,
               frame_count: int) -> bytes:
    return struct.pack(
        IVF_HEADER_FMT, b"DKIF", 0, IVF_HEADER_SIZE, b"VP80",
        width, height, framerate, timescale, frame_count, 0)


class IVFWriter:
    def __init__(self, fh: BinaryIO, width: int, height: int,
                 framerate: int = 1, timescale: int = 1, timestep: int = 1) -> None:
        self.fh = fh
        self.width = width
        self.height = height
        self.framerate = framerate
        self.timescale = timescale
        self.timestep = timestep
        self.frame_count = 0
        self._seekable = fh.seekable()
        self.fh.write(ivf_header(width, height, framerate, timescale, 0))

    def write_frame(self, payload: bytes) -> None:
        ts = self.frame_count * self.timestep
        self.fh.write(struct.pack("<IQ", len(payload), ts))
        self.fh.write(payload)
        self.frame_count += 1

    def finalize(self) -> None:
        # The reference rewrites the header with frame_count+1 (it rewrites
        # before the final increment); we write the true count.
        if self._seekable:
            self.fh.seek(0)
            self.fh.write(ivf_header(self.width, self.height, self.framerate,
                                     self.timescale, self.frame_count))
            self.fh.seek(0, 2)
        self.fh.flush()


@dataclass
class IVFInfo:
    width: int
    height: int
    framerate: int
    timescale: int
    frame_count: int


def read_ivf(data: bytes) -> tuple[IVFInfo, list[bytes]]:
    (magic, version, hdr_len, fourcc, w, h, fr, ts, count, _unused) = \
        struct.unpack_from(IVF_HEADER_FMT, data, 0)
    assert magic == b"DKIF", "not an IVF file"
    assert fourcc == b"VP80", f"unexpected codec {fourcc!r}"
    frames = []
    pos = hdr_len
    while pos + IVF_FRAME_HEADER_SIZE <= len(data):
        size, _ts = struct.unpack_from("<IQ", data, pos)
        pos += IVF_FRAME_HEADER_SIZE
        frames.append(data[pos:pos + size])
        pos += size
    return IVFInfo(w, h, fr, ts, count), frames


def iter_ivf(fh: BinaryIO) -> Iterator[bytes]:
    header = fh.read(IVF_HEADER_SIZE)
    (magic, _v, hdr_len, fourcc, *_rest) = struct.unpack_from(IVF_HEADER_FMT, header, 0)
    assert magic == b"DKIF" and fourcc == b"VP80"
    fh.read(max(0, hdr_len - IVF_HEADER_SIZE))
    while True:
        fhdr = fh.read(IVF_FRAME_HEADER_SIZE)
        if len(fhdr) < IVF_FRAME_HEADER_SIZE:
            return
        size, _ts = struct.unpack("<IQ", fhdr)
        yield fh.read(size)
