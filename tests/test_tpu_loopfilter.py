import numpy as np
import pytest

from vp8oclenc_tpu.config import EncoderConfig
from vp8oclenc_tpu.pipeline.segments import prepare_segments


def test_tpu_loopfilter_matches_spec():
    from vp8oclenc_tpu.ops.loopfilter import loop_filter_frame_tpu
    from vp8oclenc_tpu.spec import loopfilter as LF
    rng = np.random.default_rng(0)
    w, h = 96, 80
    mbw, mbh = w // 16, h // 16
    mbc = mbw * mbh
    # blocky content (encourages strong filtering)
    ry = np.kron(rng.integers(0, 256, (h // 8, w // 8)),
                 np.ones((8, 8))).astype(np.uint8)
    ru = np.kron(rng.integers(0, 256, (h // 8, w // 8)),
                 np.ones((4, 4))).astype(np.uint8)
    rv = np.kron(rng.integers(0, 256, (h // 8, w // 8)),
                 np.ones((4, 4))).astype(np.uint8)
    cfg = EncoderConfig(qi_min=60, qi_max=60)
    seg = prepare_segments(cfg, ry, False, False)
    # mix of segments and inner-mask values
    seg_ids = rng.integers(0, 4, mbc).astype(np.int32)
    inner = rng.integers(0, 2, mbc).astype(bool)

    sy, su, sv = ry.copy(), ru.copy(), rv.copy()
    LF.loop_filter_frame(sy, su, sv, seg_ids, inner, seg)

    ty, tu, tv = loop_filter_frame_tpu(ry, ru, rv, seg_ids, inner, seg)
    assert np.array_equal(ty, sy), \
        f"luma: {np.sum(ty != sy)} px differ of {sy.size}"
    assert np.array_equal(tu, su)
    assert np.array_equal(tv, sv)
    # sanity: the filter actually changed pixels
    assert np.any(sy != ry)


def test_tpu_loopfilter_level_zero_segment():
    from vp8oclenc_tpu.ops.loopfilter import loop_filter_frame_tpu
    from vp8oclenc_tpu.spec import loopfilter as LF
    rng = np.random.default_rng(1)
    w, h = 64, 48
    mbc = (w // 16) * (h // 16)
    ry = rng.integers(0, 256, (h, w)).astype(np.uint8)
    ru = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    rv = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    cfg = EncoderConfig(qi_min=40, qi_max=40)
    seg = prepare_segments(cfg, ry, True, True)
    seg.loop_filter_level = np.array([0, 20, 30, 40])   # segment 0 unfiltered
    seg_ids = (np.arange(mbc) % 4).astype(np.int32)
    inner = np.ones(mbc, dtype=bool)
    sy, su, sv = ry.copy(), ru.copy(), rv.copy()
    LF.loop_filter_frame(sy, su, sv, seg_ids, inner, seg)
    ty, tu, tv = loop_filter_frame_tpu(ry, ru, rv, seg_ids, inner, seg)
    assert np.array_equal(ty, sy)
    assert np.array_equal(tu, su)
    assert np.array_equal(tv, sv)


def test_tpu_loopfilter_keyframe_highq_regression():
    """Regression for an XLA:CPU fusion miscompile (off-by-one pixels in the
    sheared-wavefront filter, jit-on-CPU only; eager and TPU were correct).
    Exact inputs that reproduced it: a qi=50 keyframe's intra recon filtered
    with level 12 / interior 2 / hev 0.  Guarded by the optimization_barrier
    in ops/loopfilter.filter_planes."""
    from vp8oclenc_tpu.ops.loopfilter import loop_filter_frame_tpu
    from vp8oclenc_tpu.spec import intra as SPEC_INTRA
    from vp8oclenc_tpu.spec import loopfilter as LF
    from vp8oclenc_tpu.entropy import tokens as TOK
    from vp8oclenc_tpu.tables import ARE4X4, ARE16X16, INTRA_SEGMENT
    from vp8oclenc_tpu.io.y4m import pad_frame
    from tests.test_tpu_backend import replacement_sequence

    w, h = 96, 80
    f = pad_frame(replacement_sequence(w, h, 1, seed=7)[0])
    cfg = EncoderConfig(qi_min=50, qi_max=112, ssim_target=0.98)
    seg = prepare_segments(cfg, f.y, True, True)
    lv, _modes, recon = SPEC_INTRA.encode_intra_frame(f.y, f.u, f.v, seg)
    mbc = (w // 16) * (h // 16)
    parts = np.full(mbc, ARE4X4, np.int32)
    skip, _ = TOK.mb_skip_flags(lv, parts)
    inner = (parts != ARE16X16) | (~skip)
    seg_ids = np.full(mbc, INTRA_SEGMENT, np.int32)
    sy, su, sv = (p.copy() for p in recon)
    LF.loop_filter_frame(sy, su, sv, seg_ids, inner, seg)
    ty, tu, tv = loop_filter_frame_tpu(recon[0], recon[1], recon[2],
                                       seg_ids, inner, seg)
    assert np.array_equal(ty, sy), \
        f"luma: {np.sum(ty != sy)} px differ of {sy.size}"
    assert np.array_equal(tu, su)
    assert np.array_equal(tv, sv)
