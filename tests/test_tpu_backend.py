"""End-to-end backend equivalence: the jitted TPU pipeline must produce
byte-identical streams to the numpy spec oracle."""
import numpy as np
import pytest

from vp8oclenc_tpu.config import EncoderConfig
from vp8oclenc_tpu.pipeline.encoder import Encoder
from vp8oclenc_tpu.decoder.vp8dec import VP8Decoder
from tests.test_inter_roundtrip import moving_sequence


def test_backends_produce_identical_streams():
    w, h = 96, 80
    frames = moving_sequence(w, h, 5, seed=4)
    cfg = dict(qi_min=8, qi_max=30, gop_size=100, altref_range=3)
    enc_s = Encoder(EncoderConfig(**cfg), w, h, backend="spec")
    enc_t = Encoder(EncoderConfig(**cfg), w, h, backend="tpu")
    for t, f in enumerate(frames):
        ps = enc_s.encode_frame(f)
        pt = enc_t.encode_frame(f)
        assert ps == pt, (
            f"frame {t}: stream bytes differ (spec {len(ps)}B, tpu {len(pt)}B); "
            f"recon equal: {np.array_equal(enc_s.recon[0], enc_t.recon[0])}")


def test_tpu_stream_decodes_bit_exact():
    w, h = 96, 80
    frames = moving_sequence(w, h, 4, seed=12)
    cfg = EncoderConfig(qi_min=10, qi_max=35, gop_size=100, altref_range=100,
                        num_partitions=2)
    enc = Encoder(cfg, w, h, backend="tpu")
    dec = VP8Decoder()
    for t, f in enumerate(frames):
        payload = enc.encode_frame(f)
        out = dec.decode_frame(payload)
        assert np.array_equal(out.y, enc.recon[0]), f"frame {t} luma"
        assert np.array_equal(out.u, enc.recon[1]), f"frame {t} u"
        assert np.array_equal(out.v, enc.recon[2]), f"frame {t} v"
