"""Checkpoint/resume: a restored encoder must continue the stream
byte-identically — at any frame boundary (full ref snapshot) and at a GOP
boundary (counters only; the keyframe rebuilds state)."""
import numpy as np
import pytest

from vp8oclenc_tpu.config import EncoderConfig
from vp8oclenc_tpu.pipeline.encoder import Encoder
from tests.test_inter_roundtrip import moving_sequence


@pytest.mark.parametrize("backend", ["spec", "tpu"])
def test_resume_mid_gop(backend):
    w, h = 96, 80
    frames = moving_sequence(w, h, 7, seed=21)
    cfg = dict(qi_min=10, qi_max=36, gop_size=100, altref_range=3)

    ref = Encoder(EncoderConfig(**cfg), w, h, backend=backend)
    want = [ref.encode_frame(f) for f in frames]

    enc = Encoder(EncoderConfig(**cfg), w, h, backend=backend)
    for f in frames[:4]:
        enc.encode_frame(f)
    st = enc.checkpoint()
    assert st.get("last") is not None          # mid-GOP: refs snapshotted

    enc2 = Encoder(EncoderConfig(**cfg), w, h, backend=backend)
    enc2.restore(st)
    got = [enc2.encode_frame(f) for f in frames[4:]]
    for i, (a, b) in enumerate(zip(want[4:], got)):
        assert a == b, f"resumed frame {4 + i} differs"


def test_resume_at_gop_boundary_drops_refs():
    w, h = 96, 80
    frames = moving_sequence(w, h, 6, seed=8)
    cfg = dict(qi_min=10, qi_max=36, gop_size=3, altref_range=2)

    ref = Encoder(EncoderConfig(**cfg), w, h, backend="spec")
    want = [ref.encode_frame(f) for f in frames]

    enc = Encoder(EncoderConfig(**cfg), w, h, backend="spec")
    for f in frames[:3]:
        enc.encode_frame(f)
    st = enc.checkpoint()
    # frame 3 starts a new GOP: no reference pixels needed in the state
    assert "last" not in st

    enc2 = Encoder(EncoderConfig(**cfg), w, h, backend="spec")
    enc2.restore(st)
    got = [enc2.encode_frame(f) for f in frames[3:]]
    for i, (a, b) in enumerate(zip(want[3:], got)):
        assert a == b, f"resumed frame {3 + i} differs"
