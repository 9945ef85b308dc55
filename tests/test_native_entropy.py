"""Native C++ entropy path vs numpy fallback: identical records/probs/bytes."""
import numpy as np
import pytest

from vp8oclenc_tpu import tables as TBL
from vp8oclenc_tpu.entropy import tokens as TOK

native = pytest.importorskip("vp8oclenc_tpu.native.packer")
if not native.available():
    pytest.skip("no native toolchain", allow_module_level=True)


def synth_levels(mbw, mbh, seed=0, sparsity=0.8):
    rng = np.random.default_rng(seed)
    mbc = mbw * mbh
    levels = rng.integers(-80, 80, (mbc, 25, 16)).astype(np.int16)
    mask = rng.random((mbc, 25, 16)) > sparsity
    levels = (levels * mask).astype(np.int16)
    # a few big values to exercise cat5/cat6
    big = rng.integers(0, levels.size, 40)
    levels.reshape(-1)[big] = rng.integers(60, 2000, 40)
    parts = rng.integers(0, 3, mbc).astype(np.int32)
    # Y blocks of 16x16 MBs carry no DC level; Y2 only on 16x16 MBs
    has_y2 = parts == TBL.ARE16X16
    levels[has_y2, :16, 0] = 0
    levels[~has_y2, 24, :] = 0
    # force some fully-skipped MBs
    levels[rng.integers(0, mbc, mbc // 5)] = 0
    return levels, parts


@pytest.mark.parametrize("nparts", [1, 2, 4])
def test_native_matches_numpy(nparts):
    mbw, mbh = 12, 9
    levels, parts = synth_levels(mbw, mbh, seed=nparts)

    nrec, num, den, nskip = native.tokenize_frame(levels, parts, mbw, mbh, nparts)
    nprobs, nflags = TOK.probs_from_counts(num, den, nparts)

    pskip, _ = TOK.mb_skip_flags(levels, parts)
    tokdata = TOK.tokenize_frame(levels, parts, mbw, mbh)
    pprobs, pflags = TOK.count_probs(tokdata, nparts, mbw, mbh)
    order = TOK.emission_order(parts, pskip, mbw, mbh, nparts)
    precs = TOK.build_token_records(tokdata, order)

    assert np.array_equal(nskip, pskip)
    assert np.array_equal(nprobs, pprobs)
    assert np.array_equal(nflags, pflags)
    for p in range(nparts):
        assert len(nrec[p]) == len(precs[p]), \
            f"partition {p}: {len(nrec[p])} vs {len(precs[p])} records"
        for f in ("tok", "ctx1", "band", "ctx3", "skipfb", "sign", "extra"):
            assert np.array_equal(nrec[p][f], precs[p][f]), \
                f"partition {p} field {f}"
        # and the packed bytes agree end-to-end
        nb = native.pack_tokens(np.ascontiguousarray(nrec[p]), nprobs)
        pp, pb = TOK.records_to_bools(precs[p], pprobs)
        from vp8oclenc_tpu.entropy.boolcoder import BoolEncoder
        e = BoolEncoder()
        e.put_many(pp, pb)
        assert nb == e.flush()


def test_native_mb_headers_match_python(monkeypatch):
    """The C++ per-MB header coder emits the exact bool stream of the Python
    writer (same encode_frame_header bytes) on key and inter frames with
    SPLITMV/NEWMV/segmentation coverage."""
    from vp8oclenc_tpu.config import EncoderConfig
    from vp8oclenc_tpu.pipeline.encoder import Encoder
    from vp8oclenc_tpu.io.y4m import Frame
    from vp8oclenc_tpu.entropy import header as HDR

    w, h = 96, 80
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (h * 2, w * 2), dtype=np.uint8)
    frames = []
    for t in range(4):
        y = base[t * 3:t * 3 + h, t * 5:t * 5 + w]
        frames.append(Frame(y, y[::2, ::2] // 2 + 64, y[1::2, 1::2] // 2 + 60))

    def run(force_python):
        if force_python:
            monkeypatch.setattr(HDR, "_native", lambda: None)
        else:
            monkeypatch.undo()
        cfg = EncoderConfig(qi_min=10, qi_max=40, gop_size=100,
                            altref_range=2)
        enc = Encoder(cfg, w, h, backend="spec")
        return [enc.encode_frame(f) for f in frames]

    a = run(False)
    b = run(True)
    for i, (x, y_) in enumerate(zip(a, b)):
        assert x == y_, f"frame {i}: native vs python header bytes differ"


def test_native_frame_strength_matches_numpy():
    from vp8oclenc_tpu.native import packer as native
    from vp8oclenc_tpu.pipeline.segments import _loopfilter_strength_numpy
    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(11)
    for h, w in ((16, 16), (80, 96), (144, 176), (67, 131)):
        y = rng.integers(0, 256, (h, w), np.uint8)
        assert native.frame_strength(y) == _loopfilter_strength_numpy(y)
    # gradient + flat frames (edge magnitudes)
    grad = np.tile(np.arange(256, dtype=np.uint8), (64, 1))[:, :200]
    assert native.frame_strength(grad) == _loopfilter_strength_numpy(grad)
    flat = np.full((64, 64), 200, np.uint8)
    assert native.frame_strength(flat) == _loopfilter_strength_numpy(flat)
