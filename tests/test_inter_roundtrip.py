import numpy as np
import pytest

from vp8oclenc_tpu.config import EncoderConfig
from vp8oclenc_tpu.io.y4m import Frame
from vp8oclenc_tpu.pipeline.encoder import Encoder
from vp8oclenc_tpu.decoder.vp8dec import VP8Decoder


def moving_sequence(w, h, n, seed=0):
    """Textured base image panned by a couple of pixels per frame."""
    rng = np.random.default_rng(seed)
    H, W = h * 2, w * 2
    yy, xx = np.mgrid[0:H, 0:W]
    base = ((xx * 7 + yy * 3) % 256).astype(np.float64)
    base = base * 0.5 + rng.integers(0, 100, (H, W))
    base = base.clip(0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        ox, oy = 3 * t + (t % 2), 2 * t
        y = base[oy:oy + h, ox:ox + w]
        u = base[oy // 2:oy // 2 + h // 2, ox // 2:ox // 2 + w // 2] // 2 + 60
        v = base[oy // 2 + 2:oy // 2 + 2 + h // 2, ox // 2:ox // 2 + w // 2] // 2 + 60
        frames.append(Frame(np.ascontiguousarray(y), np.ascontiguousarray(u),
                            np.ascontiguousarray(v)))
    return frames


def check_roundtrip(cfg, w, h, frames):
    enc = Encoder(cfg, w, h, backend="spec")
    dec = VP8Decoder()
    n_inter = 0
    for t, frame in enumerate(frames):
        payload = enc.encode_frame(frame)
        out = dec.decode_frame(payload)
        if not out.is_key:
            n_inter += 1
        for name, got, want in (("y", out.y, enc.recon[0]),
                                ("u", out.u, enc.recon[1]),
                                ("v", out.v, enc.recon[2])):
            assert np.array_equal(got, want), (
                f"frame {t} plane {name}: maxdiff "
                f"{np.abs(got.astype(int)-want.astype(int)).max()}, "
                f"nbad {np.sum(got != want)}")
    return n_inter


def test_inter_roundtrip_last_only():
    w, h = 96, 80
    frames = moving_sequence(w, h, 5)
    cfg = EncoderConfig(qi_min=8, qi_max=30, gop_size=100, altref_range=100)
    n_inter = check_roundtrip(cfg, w, h, frames)
    assert n_inter >= 3


def test_inter_roundtrip_golden_altref():
    w, h = 96, 80
    frames = moving_sequence(w, h, 8, seed=5)
    cfg = EncoderConfig(qi_min=6, qi_max=24, gop_size=100, altref_range=3)
    n_inter = check_roundtrip(cfg, w, h, frames)
    assert n_inter >= 5


def test_inter_roundtrip_multi_partition():
    w, h = 96, 80
    frames = moving_sequence(w, h, 4, seed=7)
    cfg = EncoderConfig(qi_min=10, qi_max=30, gop_size=100,
                        num_partitions=2, altref_range=100)
    check_roundtrip(cfg, w, h, frames)


def test_inter_roundtrip_ssim_target():
    w, h = 96, 80
    frames = moving_sequence(w, h, 5, seed=11)
    cfg = EncoderConfig(qi_min=4, qi_max=60, gop_size=100,
                        ssim_target=0.9, altref_range=100)
    enc = Encoder(cfg, w, h, backend="spec")
    dec = VP8Decoder()
    saw_segments = False
    for t, frame in enumerate(frames):
        payload = enc.encode_frame(frame)
        out = dec.decode_frame(payload)
        assert np.array_equal(out.y, enc.recon[0]), f"frame {t} luma"
        assert np.array_equal(out.u, enc.recon[1]), f"frame {t} u"
        assert np.array_equal(out.v, enc.recon[2]), f"frame {t} v"
    # with a high qmax and an SSIM target, some MBs should improve segments


def test_inter_improves_over_intra_bitrate():
    """P-frames of a static-ish pan should be much smaller than keyframes."""
    w, h = 96, 80
    frames = moving_sequence(w, h, 4, seed=3)
    cfg = EncoderConfig(qi_min=12, qi_max=12, gop_size=100, altref_range=100)
    enc = Encoder(cfg, w, h, backend="spec")
    sizes = [len(enc.encode_frame(f)) for f in frames]
    assert min(sizes[1:]) < sizes[0] * 0.8, sizes
