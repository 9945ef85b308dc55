"""Multi-chip end-to-end encode must be byte-identical to the sequential
encoder and produce decoder-oracle-valid streams."""
import numpy as np

from vp8oclenc_tpu.config import EncoderConfig
from vp8oclenc_tpu.io.y4m import Frame
from vp8oclenc_tpu.parallel.mesh import make_mesh


def _sequence(w, h, n, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h + 64, 0:w + 64]
    base = (120 + 60 * np.sin(xx / 11.0) * np.cos(yy / 7.0)
            + rng.integers(0, 30, xx.shape)).clip(0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        y = np.ascontiguousarray(base[2 * t:2 * t + h, 3 * t:3 * t + w])
        u = np.ascontiguousarray(
            base[t:t + h // 2, t:t + w // 2] // 2 + 60)
        v = np.ascontiguousarray(
            base[t + 4:t + 4 + h // 2, t + 2:t + 2 + w // 2] // 2 + 50)
        frames.append(Frame(y, u, v))
    return frames


def test_multichip_stream_equals_sequential():
    from vp8oclenc_tpu.parallel.encoder import encode_frames_multichip
    from vp8oclenc_tpu.pipeline.encoder import Encoder
    from vp8oclenc_tpu.decoder.vp8dec import VP8Decoder

    w, h = 128, 128
    n = 8
    cfg = dict(qi_min=10, qi_max=36, gop_size=4, altref_range=3)
    frames = _sequence(w, h, n)

    enc = Encoder(EncoderConfig(**cfg), w, h, backend="spec")
    want = [enc.encode_frame(f) for f in frames]

    mesh = make_mesh(8, gop=2, tile=4)
    got = encode_frames_multichip(EncoderConfig(**cfg), frames, w, h, mesh)

    assert len(got) == n
    for i, (a, b) in enumerate(zip(want, got)):
        assert a == b, f"frame {i}: {len(a)}B vs {len(b)}B"

    # decoder oracle: every frame of the multichip stream decodes
    dec = VP8Decoder()
    for i, payload in enumerate(got):
        out = dec.decode_frame(payload)
        assert out.y.shape == (h, w)


def test_multichip_stream_equals_sequential_ssim_target():
    """VERDICT r3 #2: the SSIM quality controller (fused per-MB intra
    replacement + weaken rule) on the mesh path, byte-identical to the
    sequential encoder with -SSIM-target on."""
    from vp8oclenc_tpu.parallel.encoder import encode_frames_multichip
    from vp8oclenc_tpu.pipeline.encoder import Encoder
    from vp8oclenc_tpu.decoder.vp8dec import VP8Decoder

    w, h = 128, 128
    n = 6
    cfg = dict(qi_min=10, qi_max=100, gop_size=6, altref_range=3,
               ssim_target=0.95)
    frames = _sequence(w, h, n, seed=5)

    enc = Encoder(EncoderConfig(**cfg), w, h, backend="spec")
    want, replaced_any = [], 0
    for f in frames:
        want.append(enc.encode_frame(f))
        replaced_any += enc.last_frame_stats["replaced"]
    # the controller must actually fire somewhere or the test is vacuous
    assert replaced_any > 0, "ssim controller never fired; raise qi_max"

    mesh = make_mesh(8, gop=2, tile=4)
    got = encode_frames_multichip(EncoderConfig(**cfg), frames, w, h, mesh)

    assert len(got) == n
    for i, (a, b) in enumerate(zip(want, got)):
        assert a == b, f"frame {i}: {len(a)}B vs {len(b)}B"
    dec = VP8Decoder()
    for payload in got:
        dec.decode_frame(payload)


def test_multichip_nonsquare_partitions_promotion():
    """VERDICT r3 #8: non-square frame, partitions=4, and golden/altref
    promotions mid-GOP with tile>1, byte-identical to sequential."""
    from vp8oclenc_tpu.parallel.encoder import encode_frames_multichip
    from vp8oclenc_tpu.pipeline.encoder import Encoder

    w, h = 192, 96           # mbw=12, mbh=6 -> 2 MB rows per tile chip
    n = 7
    cfg = dict(qi_min=8, qi_max=40, gop_size=7, altref_range=2,
               num_partitions=4)
    frames = _sequence(w, h, n, seed=33)

    enc = Encoder(EncoderConfig(**cfg), w, h, backend="spec")
    want = [enc.encode_frame(f) for f in frames]

    mesh = make_mesh(6, gop=2, tile=3)   # 3 tiles: awkward division, 6/3=2
    got = encode_frames_multichip(EncoderConfig(**cfg), frames, w, h, mesh)

    assert len(got) == n
    for i, (a, b) in enumerate(zip(want, got)):
        assert a == b, f"frame {i}: {len(a)}B vs {len(b)}B"


import os
import pytest


@pytest.mark.skipif(os.environ.get("VP8TPU_SLOW") != "1",
                    reason="~14 min on the virtual CPU mesh; last recorded "
                           "run committed as MULTICHIP_4K_r05.json")
def test_4k_executes_end_to_end():
    """BASELINE config 5 / VERDICT r4 #6: one real 3840x2176 keyframe plus
    one inter frame through the sharded (gop, tile) step, decoder
    validated."""
    import numpy as np
    from vp8oclenc_tpu.config import EncoderConfig
    from vp8oclenc_tpu.decoder.vp8dec import VP8Decoder
    from vp8oclenc_tpu.io.y4m import Frame
    from vp8oclenc_tpu.parallel.encoder import encode_frames_multichip
    from vp8oclenc_tpu.parallel.mesh import make_mesh

    W, H = 3840, 2176
    mesh = make_mesh(8, gop=4, tile=2)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H + 8, 0:W + 8]
    base = (128 + 60 * np.sin(xx / 37.0) * np.cos(yy / 29.0))
    base = (base + rng.integers(0, 24, base.shape)).clip(0, 255) \
        .astype(np.uint8)
    frames = []
    for t in range(2):
        y = np.ascontiguousarray(base[t * 2:t * 2 + H, t * 4:t * 4 + W])
        u = np.ascontiguousarray(base[t:t + H // 2, t:t + W // 2] // 2 + 60)
        v = np.ascontiguousarray(base[t + 2:t + 2 + H // 2,
                                      t:t + W // 2] // 2 + 50)
        frames.append(Frame(y, u, v))
    cfg = EncoderConfig(qi_min=12, qi_max=40, gop_size=2, altref_range=2)
    payloads = encode_frames_multichip(cfg, frames, W, H, mesh)
    assert len(payloads) == 2 and all(len(p) > 1000 for p in payloads)
    dec = VP8Decoder()
    for p in payloads:
        img = dec.decode_frame(p)
    assert img.y.shape == (H, W)
