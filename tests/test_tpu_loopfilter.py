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
