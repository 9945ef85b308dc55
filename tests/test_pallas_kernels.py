"""Pallas kernel parity (interpreter mode) against the XLA formulations.

The compiled kernels are exercised on real TPU hardware by
tools/profile_inter_r5.py and the TPU bench; here the same kernel bodies run
through the Pallas interpreter on tiny shapes and must be bit-identical to
the ops/inter.py XLA path they replace."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vp8oclenc_tpu.ops import inter as I
from vp8oclenc_tpu.ops import transforms as T
from vp8oclenc_tpu.ops.pallas_kernels import qpel_search25


def _plane_and_raw(rng, W_, H_, n, nbx, fv, ph, pw, margin):
    """Build a padded random plane and both gather forms at base c+fv-margin:
    the shifted flat patch (XLA consumers) and the phase-table raw+ry pair
    (Pallas kernels)."""
    pad = 24
    planes = rng.integers(0, 256, (3, H_ + 2 * pad, W_ + 2 * pad), np.uint8)
    PH = -(-planes.shape[1] // 8) * 8
    PW = -(-planes.shape[2] // 16) * 16
    planes = np.pad(planes, ((0, 0), (0, PH - planes.shape[1]),
                             (0, PW - planes.shape[2])), mode="edge")
    planes = jnp.asarray(planes)
    cx = jnp.tile(jnp.arange(nbx) * 8, H_ // 8)
    cy = jnp.repeat(jnp.arange(H_ // 8) * 8, nbx)
    ridx = jnp.broadcast_to(jnp.arange(3)[:, None], (3, n))
    gy = cy[None] + jnp.asarray(fv[..., 1]) + (pad - margin)
    gx = cx[None] + jnp.asarray(fv[..., 0]) + (pad - margin)
    patch = I._tile_take_patch(planes, ridx, gy, gx, ph, pw, as_flat=True)
    tbl = I.build_phase_tables(planes)
    raw, ry = I.phase_gather(tbl, PH // 8, PW // 16, ridx, gy, gx)
    return patch, raw, ry


def test_phase_gather_matches_tile_take_patch():
    """A phase-table row, rolled down by ry rows host-side, must equal the
    shifted _tile_take_patch patch (first 16 of its 32-lane stride)."""
    rng = np.random.default_rng(11)
    W_, H_, nbx = 64, 40, 8
    n = nbx * (H_ // 8)
    fv = rng.integers(-9, 10, (3, n, 2), np.int32)
    patch, raw, ry = _plane_and_raw(rng, W_, H_, n, nbx, fv, 17, 17, 3)
    patch = np.asarray(patch).reshape(3, n, 17, 32)
    raw = np.asarray(raw).reshape(3, n, 24, 16)
    ry = np.asarray(ry)
    for r in range(3):
        for b in range(0, n, 7):
            o = ry[r, b]
            assert np.array_equal(raw[r, b, o:o + 17, :14],
                                  patch[r, b, :, :14])


def test_qpel_search25_interpret_matches_xla():
    rng = np.random.default_rng(4)
    W_, H_ = 64, 32
    nbx = W_ // 8
    n = nbx * (H_ // 8)
    cur = rng.integers(0, 256, (n, 64), np.uint8)
    v0full = rng.integers(-4, 5, (3, n, 2), np.int32)
    v0 = v0full * 4
    patch, raw, offs = _plane_and_raw(rng, W_, H_, n, nbx, v0full, 17, 17, 3)

    # XLA reference: 25 refinement candidates only (zero-MV merged later by
    # the caller), penalty + validity + earliest-min select
    cx = jnp.tile(jnp.arange(nbx) * 8, H_ // 8) * 4
    cy = jnp.repeat(jnp.arange(H_ // 8) * 8, nbx) * 4
    v0x, v0y = jnp.asarray(v0[..., 0]), jnp.asarray(v0[..., 1])
    FH, FV = I._qpel_filter_matrices()
    rnd = lambda x: jnp.clip(jnp.floor((x + 64.0) * (1.0 / 128.0)), 0, 255)
    h = rnd(I._const_matmul(patch, FH))
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
        raw, offs, jnp.asarray(cur), jnp.asarray(v0),
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
    cur = rng.integers(0, 256, (n, 64), np.uint8)
    v0 = rng.integers(-6, 7, (3, n, 2), np.int32)
    p1, r1, o1 = _plane_and_raw(rng, W_, H_, n, nbx, v0, 12, 12, 2)
    p0, r0, o0 = _plane_and_raw(rng, W_, H_, n, nbx, np.zeros_like(v0),
                                12, 12, 2)
    patches = jnp.stack([p1, p0])
    raw = jnp.stack([r1, r0])
    offs = jnp.stack([o1, o0])

    # XLA reference (the search_level fallback path)
    cx = jnp.tile(jnp.arange(nbx) * 8, nby)
    cy = jnp.repeat(jnp.arange(nby) * 8, nbx)
    v0x, v0y = jnp.asarray(v0[..., 0]), jnp.asarray(v0[..., 1])
    cand = I._const_matmul(patches, I._sel25_matrix())
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
        raw, offs, jnp.asarray(cur), jnp.asarray(v0),
        0, nbx, W_, H_, penalty=True, interpret=True)
    assert np.array_equal(np.asarray(got_x), np.asarray(want_x))
    assert np.array_equal(np.asarray(got_y), np.asarray(want_y))
