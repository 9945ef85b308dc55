"""Golden byte checksums of fixed streams.

The decoder oracle proves streams are *valid*; these pins prove they are
*unchanged*: any modification of the encoder's output — mode decisions,
probabilities, bitstream layout — trips a checksum even if the new stream
still decodes.  (The round-trip tests alone could silently absorb matched
encoder+decoder behavior drifts; VERDICT r1 "oracle self-reference".)

If a change is INTENTIONALLY supposed to alter output bytes (it rarely is:
the TPU backend must match the spec oracle, and the spec's behavior is the
project's frozen reference), regenerate with the docstring recipe and say
so in the commit message.
"""
import hashlib

from vp8oclenc_tpu.config import EncoderConfig
from vp8oclenc_tpu.pipeline.encoder import Encoder


def _digest(frames, w, h, **cfg):
    enc = Encoder(EncoderConfig(**cfg), w, h, backend="spec")
    d = hashlib.sha256()
    for f in frames:
        d.update(enc.encode_frame(f))
    return d.hexdigest()


def test_golden_inter_stream():
    from tests.test_inter_roundtrip import moving_sequence
    assert _digest(
        moving_sequence(96, 80, 5, seed=4), 96, 80,
        qi_min=8, qi_max=30, gop_size=100, altref_range=3) == \
        "beb699ea59acf7778ea2bcc0521d3e82589da698ee73ba07dcb15ca7432017b6"


def test_golden_partitioned_keyframes():
    from tests.test_inter_roundtrip import moving_sequence
    assert _digest(
        moving_sequence(96, 80, 4, seed=12), 96, 80,
        qi_min=10, qi_max=35, gop_size=2, altref_range=100,
        num_partitions=4) == \
        "196610c68b9dd04d928eecd91d7d8dad6653f033294f087922d79a4f8f7a632f"


def test_golden_ssim_controller_stream():
    from tests.test_tpu_backend import replacement_sequence
    assert _digest(
        replacement_sequence(96, 80, 5, seed=7), 96, 80,
        qi_min=50, qi_max=112, gop_size=100, ssim_target=0.98,
        altref_range=100) == \
        "93a24e987a688c4fd4220706412921532e430ba2932ada66854fa3e591f964f8"
