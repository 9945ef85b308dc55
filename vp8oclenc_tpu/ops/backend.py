"""TPU backend facade used by pipeline.encoder.

Wraps the jitted JAX kernels (ops/) behind the same interface as the numpy
spec oracle so the two backends are interchangeable and must produce
byte-identical streams.
"""
from __future__ import annotations

import numpy as np

from vp8oclenc_tpu.config import EncoderConfig


class TPUBackend:
    def __init__(self, cfg: EncoderConfig, wrk_w: int, wrk_h: int) -> None:
        self.cfg = cfg
        self.wrk_w = wrk_w
        self.wrk_h = wrk_h

    def encode_intra_frame(self, y, u, v, seg):
        from vp8oclenc_tpu.ops.intra import encode_intra_frame_tpu
        return encode_intra_frame_tpu(y, u, v, seg)

    def loop_filter(self, ry, ru, rv, segment_ids, inner, seg):
        from vp8oclenc_tpu.ops.loopfilter import loop_filter_frame_tpu
        return loop_filter_frame_tpu(ry, ru, rv, segment_ids, inner, seg)

    def encode_inter_frame(self, enc, y, u, v, seg, is_golden, is_altref):
        from vp8oclenc_tpu.ops.inter import encode_inter_frame_tpu
        return encode_inter_frame_tpu(enc, y, u, v, seg, is_golden, is_altref)
