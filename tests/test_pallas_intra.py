"""Pallas intra-wavefront parity (interpreter mode) against the XLA
sheared wavefronts + finalize passes of ops/intra.py, which are
themselves bit-identical to the sequential spec oracle
(tests/test_tpu_intra.py)."""
import numpy as np

import jax.numpy as jnp

from vp8oclenc_tpu.ops.intra import (_chroma_finalize,
                                     _chroma_wavefront_sheared,
                                     _luma_finalize,
                                     _luma_wavefront_sheared)
from vp8oclenc_tpu.ops.pallas_intra import chroma_wavefront, luma_wavefront


def _check_luma(seed, W, H, dc_q, ac_q):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    w4, h4 = W // 4, H // 4
    want = _luma_wavefront_sheared(y, w4, h4, dc_q, ac_q)
    want_lv, want_md = _luma_finalize(want, y, w4, h4, dc_q, ac_q)
    got, got_lv, got_md = luma_wavefront(y, w4, h4, dc_q, ac_q,
                                         interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    assert np.array_equal(np.asarray(got_lv), np.asarray(want_lv))
    assert np.array_equal(np.asarray(got_md), np.asarray(want_md))


def test_luma_wavefront_matches_sheared():
    _check_luma(5, 96, 80, 8, 10)


def test_luma_wavefront_matches_sheared_wide():
    # non-square, shallow: exercises the right-edge + above-MB-row rules
    _check_luma(6, 176, 48, 17, 23)


def test_chroma_wavefront_matches_sheared():
    rng = np.random.default_rng(7)
    mbw, mbh = 11, 6
    uv = jnp.asarray(rng.integers(0, 256, (2, mbh * 8, mbw * 8), np.uint8))
    want = _chroma_wavefront_sheared(uv, mbw, mbh, 12, 14)
    want_lv = _chroma_finalize(want, uv, mbw, mbh, 12, 14)
    got, got_lv = chroma_wavefront(uv, mbw, mbh, 12, 14, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    assert np.array_equal(np.asarray(got_lv), np.asarray(want_lv))


import os
import pytest


@pytest.mark.skipif(os.environ.get("VP8TPU_SLOW") != "1",
                    reason="~5 min in interpreter mode; the compiled kernel "
                           "is checked on-device by tools/tpu_parity.py "
                           "(recorded in PARITY_TPU.json each bench run)")
def test_trial_luma_matches_batched():
    from vp8oclenc_tpu.ops.intra_replace import _trial_luma
    from vp8oclenc_tpu.ops.pallas_intra import trial_luma
    rng = np.random.default_rng(3)
    mbc = 150                        # exercises the 128-lane pad tail
    y_mb = jnp.asarray(rng.integers(0, 256, (mbc, 16, 16), np.int32))
    ftop = jnp.asarray(rng.integers(0, 256, (mbc, 21), np.int32))
    fleft = jnp.asarray(rng.integers(0, 256, (mbc, 16), np.int32))
    want = _trial_luma(y_mb, ftop, fleft, 8, 10)
    got = trial_luma(y_mb, ftop, fleft, 8, 10, interpret=True)
    for a, b in zip(got, want):
        assert np.array_equal(np.asarray(a), np.asarray(b))
