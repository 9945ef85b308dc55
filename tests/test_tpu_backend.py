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


def test_dct_cost_matmul_exact():
    """The MXU cost matmul at DEFAULT precision must reproduce the int64
    oracle bit-for-bit (inputs/table are bf16-exact integers; all f32
    intermediates < 2^24 — see ops/transforms.dct_cost)."""
    import jax.numpy as jnp
    from vp8oclenc_tpu.ops import transforms as OT
    from vp8oclenc_tpu.spec import transforms as ST

    rng = np.random.default_rng(7)
    x = rng.integers(-255, 256, size=(4096, 16), dtype=np.int64)
    # adversarial extremes: all +-255 sign patterns on a few rows
    x[:64] = 255 * np.where(
        rng.integers(0, 2, size=(64, 16)) > 0, 1, -1)
    want = ST.dct_cost(x)
    got = np.asarray(OT.dct_cost(jnp.asarray(x, jnp.int32)))
    assert np.array_equal(want, got)


def replacement_sequence(w, h, n, seed=7):
    """Content engineered to fire the intra-replacement controller: a static
    noise background (inter predicts it perfectly with a zero MV) plus
    regions whose content is a FRESH smooth gradient every frame — inter
    mispredicts them (old gradient vs new), the coarse quantizer cannot fix
    the residual, and the intra B_PRED trial reconstructs the smooth ramp
    with a higher SSIM.  Chroma is constant so the scene-change detector
    (which only watches U/V, vp8enc.cpp:265-311) never forces a keyframe."""
    from vp8oclenc_tpu.io.y4m import Frame
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w)).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    yy, xx = np.mgrid[0:32, 0:32]
    frames = []
    for _ in range(n):
        y = base.copy()
        for (oy, ox) in ((16, 32), (48, 0), (32, 64)):
            a, b = rng.uniform(-6, 6, 2)
            g = (128 + a * (xx - 16) + b * (yy - 16)).clip(0, 255)
            y[oy:oy + 32, ox:ox + 32] = g.astype(np.uint8)
        frames.append(Frame(y, u.copy(), v.copy()))
    return frames


def test_backends_identical_streams_ssim_on():
    """Full SSIM controller (progressive segments + batched on-device intra
    replacement) must match the spec oracle byte-for-byte, and the stream
    must still decode bit-exact."""
    w, h = 96, 80
    frames = replacement_sequence(w, h, 5, seed=7)
    cfg = dict(qi_min=50, qi_max=112, gop_size=100, ssim_target=0.98,
               altref_range=100)
    enc_s = Encoder(EncoderConfig(**cfg), w, h, backend="spec")
    enc_t = Encoder(EncoderConfig(**cfg), w, h, backend="tpu")
    dec = VP8Decoder()
    total_replaced = 0
    for t, f in enumerate(frames):
        ps = enc_s.encode_frame(f)
        pt = enc_t.encode_frame(f)
        assert ps == pt, (
            f"frame {t}: stream bytes differ (spec {len(ps)}B, tpu {len(pt)}B)")
        out = dec.decode_frame(pt)
        assert np.array_equal(out.y, enc_t.recon[0]), f"frame {t} luma"
        total_replaced += enc_t.last_frame_stats["replaced"]
    # the byte-equality above is only meaningful if the device replacement
    # controller (ops/intra_replace.py) actually fired on this sequence
    assert total_replaced > 0, "no MB was ever intra-replaced; test is vacuous"
