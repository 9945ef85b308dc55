import numpy as np
import pytest

from vp8oclenc_tpu.config import EncoderConfig
from vp8oclenc_tpu.io.y4m import Frame
from vp8oclenc_tpu.pipeline.encoder import Encoder
from vp8oclenc_tpu.decoder.vp8dec import VP8Decoder
from vp8oclenc_tpu.spec import transforms as T


def synth_frame(w, h, seed=0, t=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 3 + yy * 2 + t * 5) % 255).astype(np.uint8)
    y = (y * 0.7 + rng.integers(0, 80, (h, w))).clip(0, 255).astype(np.uint8)
    u = ((xx[::2, ::2] + t * 3) % 200 + 20).astype(np.uint8)
    v = ((yy[::2, ::2] + t * 7) % 200 + 20).astype(np.uint8)
    return Frame(y, u, v)


def test_dct_roundtrip_small_residuals():
    rng = np.random.default_rng(2)
    res = rng.integers(-255, 256, (64, 4, 4)).astype(np.int32)
    c = T.fdct4x4(res)
    # unquantized inverse must reproduce the residual exactly (q=1)
    rec = T.idct4x4(T.dequant4x4(T.quant4x4(c, 1, 1), 1, 1))
    assert np.abs(rec - res).max() <= 1


def test_wht_roundtrip():
    rng = np.random.default_rng(3)
    dcs = rng.integers(-2000, 2000, (16, 4, 4)).astype(np.int32)
    c = T.fwht4x4(dcs)
    rec = T.iwht4x4(T.dequant4x4(T.quant4x4(c, 1, 1), 1, 1))
    # fwht includes a >>1 normalization; iwht has gain compensating
    assert np.abs(rec - dcs).max() <= 2


@pytest.mark.parametrize("size,qi", [((64, 48), 8), ((176, 144), 40), ((70, 50), 20)])
def test_keyframe_roundtrip(size, qi):
    w, h = size
    cfg = EncoderConfig(qi_min=qi, qi_max=qi, gop_size=1)
    enc = Encoder(cfg, w, h, backend="spec")
    dec = VP8Decoder()
    for t in range(2):
        frame = synth_frame(w, h, seed=t, t=t)
        payload = enc.encode_frame(frame)
        out = dec.decode_frame(payload)
        assert out.is_key
        ry, ru, rv = enc.recon
        assert np.array_equal(out.y, ry), \
            f"luma mismatch: {np.abs(out.y.astype(int)-ry.astype(int)).max()}"
        assert np.array_equal(out.u, ru)
        assert np.array_equal(out.v, rv)


def test_keyframe_quality_reasonable():
    w, h = 176, 144
    cfg = EncoderConfig(qi_min=8, qi_max=8, gop_size=1)
    enc = Encoder(cfg, w, h, backend="spec")
    frame = synth_frame(w, h)
    enc.encode_frame(frame)
    ry = enc.recon[0][:h, :w].astype(np.float64)
    src = frame.y.astype(np.float64)
    mse = np.mean((ry - src) ** 2)
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > 30, f"PSNR too low: {psnr:.2f}"


def test_multi_partition_roundtrip():
    w, h = 64, 64
    cfg = EncoderConfig(qi_min=12, qi_max=12, gop_size=1, num_partitions=4)
    enc = Encoder(cfg, w, h, backend="spec")
    dec = VP8Decoder()
    payload = enc.encode_frame(synth_frame(w, h, seed=9))
    out = dec.decode_frame(payload)
    assert np.array_equal(out.y, enc.recon[0])
    assert np.array_equal(out.u, enc.recon[1])
    assert np.array_equal(out.v, enc.recon[2])
