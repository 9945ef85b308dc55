"""Pallas kernel parity (interpreter mode) against the XLA formulations.

The compiled kernels are exercised on real TPU hardware by
tools/profile_inter.py and the TPU bench; here the same kernel bodies run
through the Pallas interpreter on tiny shapes and must be bit-identical to
the ops/inter.py XLA path they replace."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vp8oclenc_tpu.ops import inter as I
from vp8oclenc_tpu.ops import transforms as T
from vp8oclenc_tpu.ops.pallas_kernels import fullpel_costs, qpel_search25


def test_fullpel_costs_interpret_matches_xla():
    rng = np.random.default_rng(3)
    n = 40
    patches = rng.integers(0, 256, (2, 3, n, 384), np.uint8)
    cur = rng.integers(0, 256, (n, 64), np.uint8)

    cand = I._const_matmul(jnp.asarray(patches), I._sel25_matrix())
    cur_t = jnp.tile(jnp.asarray(cur.astype(np.int32)).astype(jnp.bfloat16),
                     (1, 25))
    res = cand.astype(jnp.bfloat16) - cur_t[None, None]
    want = np.asarray(T.dct_cost_rows64(res.reshape(2, 3, n, 25, 64)))

    got = np.asarray(fullpel_costs(jnp.asarray(patches), jnp.asarray(cur),
                                   interpret=True))
    assert np.array_equal(got, want)


def test_qpel_search25_interpret_matches_xla():
    rng = np.random.default_rng(4)
    W_, H_ = 64, 32
    nbx = W_ // 8
    n = nbx * (H_ // 8)
    patch = rng.integers(0, 256, (3, n, 544), np.uint8)
    cur = rng.integers(0, 256, (n, 64), np.uint8)
    v0full = rng.integers(-4, 5, (3, n, 2), np.int32)
    v0 = v0full * 4

    # XLA reference: 25 refinement candidates only (zero-MV merged later by
    # the caller), penalty + validity + earliest-min select
    cx = jnp.tile(jnp.arange(nbx) * 8, H_ // 8) * 4
    cy = jnp.repeat(jnp.arange(H_ // 8) * 8, nbx) * 4
    v0x, v0y = jnp.asarray(v0[..., 0]), jnp.asarray(v0[..., 1])
    FH, FV = I._qpel_filter_matrices()
    rnd = lambda x: jnp.clip(jnp.floor((x + 64.0) * (1.0 / 128.0)), 0, 255)
    h = rnd(I._const_matmul(jnp.asarray(patch), FH))
    v = rnd(I._const_matmul(h, FV))
    preds = v.astype(jnp.bfloat16).reshape(3, n, 25, 64)
    pxs, pys = [], []
    for cand in range(25):
        dx, dy = (cand % 5) - 2, (cand // 5) - 2
        pxs.append(jnp.broadcast_to(cx[None] + v0x + dx, (3, n)))
        pys.append(jnp.broadcast_to(cy[None] + v0y + dy, (3, n)))
    px_s, py_s = jnp.stack(pxs), jnp.stack(pys)
    cur_b = jnp.asarray(cur.astype(np.int32)).astype(jnp.bfloat16)
    costs = jnp.moveaxis(T.dct_cost_rows64(preds - cur_b[None, :, None, :]),
                         2, 0)
    pen = (jnp.abs(px_s - (cx[None] + v0x)[None])
           + jnp.abs(py_s - (cy[None] + v0y)[None])) * 32
    costs = costs + pen
    invalid = (px_s < 0) | (px_s > W_ * 4 - 32) | (py_s < 0) \
        | (py_s > H_ * 4 - 32)
    costs = jnp.where(invalid, I.BIG, costs).astype(jnp.int32)
    bidx = jnp.argmin(costs, axis=0)
    want_cost = np.asarray(
        jnp.take_along_axis(costs, bidx[None], axis=0)[0])
    want_idx = np.asarray(bidx)
    want_pred = np.asarray(jnp.take_along_axis(
        preds, bidx[..., None, None], axis=2)[:, :, 0].astype(jnp.int32))

    got_cost, got_idx, got_pred = (np.asarray(o) for o in qpel_search25(
        jnp.asarray(patch), jnp.asarray(cur), jnp.asarray(v0),
        nbx, W_, H_, interpret=True))
    assert np.array_equal(got_cost, want_cost)
    assert np.array_equal(got_idx, want_idx)
    assert np.array_equal(got_pred, want_pred)


def test_fullpel_search50_interpret_matches_xla_select():
    """The select-fused fullpel kernel must reproduce the XLA stack +
    _select_first_min ordering (window1's 25 then window0's, earliest
    minimum) including penalty and frame-bounds masking."""
    from vp8oclenc_tpu.ops.pallas_kernels import fullpel_search50

    rng = np.random.default_rng(9)
    nbx, nby = 8, 5
    n = nbx * nby
    W_, H_ = nbx * 8, nby * 8
    patches = rng.integers(0, 256, (2, 3, n, 384), np.uint8)
    cur = rng.integers(0, 256, (n, 64), np.uint8)
    v0 = rng.integers(-6, 7, (3, n, 2), np.int32)

    # XLA reference (the search_level fallback path)
    cx = jnp.tile(jnp.arange(nbx) * 8, nby)
    cy = jnp.repeat(jnp.arange(nby) * 8, nbx)
    v0x, v0y = jnp.asarray(v0[..., 0]), jnp.asarray(v0[..., 1])
    cand = I._const_matmul(jnp.asarray(patches), I._sel25_matrix())
    cur_t = jnp.tile(jnp.asarray(cur.astype(np.int32)).astype(jnp.bfloat16),
                     (1, 25))
    res = cand.astype(jnp.bfloat16) - cur_t[None, None]
    costs = T.dct_cost_rows64(res.reshape(2, 3, n, 25, 64))
    costs = jnp.moveaxis(costs, 3, 1).reshape(50, 3, n)
    pxs, pys = [], []
    for vx0, vy0 in ((v0x, v0y), (0, 0)):
        for dxy in range(25):
            dx, dy = (dxy % 5) - 2, (dxy // 5) - 2
            pxs.append(jnp.broadcast_to(cx[None] + vx0 + dx, (3, n)))
            pys.append(jnp.broadcast_to(cy[None] + vy0 + dy, (3, n)))
    px_s, py_s = jnp.stack(pxs), jnp.stack(pys)
    costs = costs + (jnp.abs(px_s - (cx[None] + v0x)[None])
                     + jnp.abs(py_s - (cy[None] + v0y)[None])) * 32
    invalid = (px_s < 0) | (px_s > W_ - 8) | (py_s < 0) | (py_s > H_ - 8)
    costs = jnp.where(invalid, I.BIG, costs).astype(jnp.int32)
    want_x, want_y, _c, _i = I._select_first_min(costs, px_s, py_s)

    got_x, got_y = fullpel_search50(
        jnp.asarray(patches), jnp.asarray(cur), jnp.asarray(v0),
        0, nbx, W_, H_, penalty=True, interpret=True)
    assert np.array_equal(np.asarray(got_x), np.asarray(want_x))
    assert np.array_equal(np.asarray(got_y), np.asarray(want_y))
