"""Device wire-format (v2) round trip: pack on (CPU) jax, unpack with numpy."""
import numpy as np

from vp8oclenc_tpu.ops.wire import (body_capacity, head_size, pack_wire,
                                    unpack_head, unpack_levels)


def _pack(levels, meta, ssim, replaced=0):
    import jax.numpy as jnp
    head, body, stats = pack_wire(jnp.asarray(levels), jnp.asarray(meta),
                                  jnp.asarray(ssim), replaced)
    return np.asarray(head), np.asarray(body)


def test_wire_roundtrip():
    rng = np.random.default_rng(3)
    mbc = 60
    levels = (rng.integers(-60, 60, (mbc, 25, 16))
              * (rng.random((mbc, 25, 16)) > 0.8)).astype(np.int16)
    # escapes: a couple of large values (|v| > 127), <= 2 per MB
    for mbn in range(0, mbc, 3):
        k = int(rng.integers(1, 3))
        pos = rng.choice(400, k, replace=False)
        levels.reshape(mbc, 400)[mbn, pos] = rng.integers(
            128, 2048, k) * rng.choice([-1, 1], k)
    seg = rng.integers(0, 4, mbc)
    part = rng.integers(0, 2, mbc)
    ref = rng.integers(0, 3, mbc)
    mvs = rng.integers(-2000, 2000, (mbc, 8))
    meta = np.concatenate(
        [seg[:, None], part[:, None], ref[:, None], mvs], axis=1
    ).astype(np.int32)
    ssim = rng.integers(-98304, 98304, mbc).astype(np.int32)  # Q15 fx

    head, body = _pack(levels, meta, ssim, replaced=7)
    assert head.size == head_size(mbc)
    assert body.size == body_capacity(mbc)

    info = unpack_head(head, mbc)
    assert info["replaced"] == 7
    assert not info["esc_overflow"]
    n_expected = int(np.any(levels != 0, axis=2).sum())
    assert info["n_active"] == n_expected
    lv = unpack_levels(info, body[: info["n_active"] * 16], mbc)
    assert np.array_equal(lv, levels)
    assert np.array_equal(info["seg"], seg)
    assert np.array_equal(info["part"], part)
    assert np.array_equal(info["ref"], ref)
    assert np.array_equal(info["mvs"].reshape(mbc, 8), mvs.astype(np.int16))
    assert info["ssim_min_fx"] == ssim.min()
    assert info["ssim_sum_fx"] == int(np.maximum(ssim, -98304).sum())


def test_wire_sparse_body_is_small():
    mbc = 16
    levels = np.zeros((mbc, 25, 16), dtype=np.int16)
    levels[3, 7, 2] = -5
    levels[10, 24, 0] = 9
    meta = np.zeros((mbc, 11), dtype=np.int32)
    ssim = np.zeros(mbc, dtype=np.int32)
    head, body = _pack(levels, meta, ssim)
    info = unpack_head(head, mbc)
    assert info["n_active"] == 2
    lv = unpack_levels(info, body[:32], mbc)
    assert np.array_equal(lv, levels)


def test_wire_overflow_flag():
    mbc = 4
    levels = np.zeros((mbc, 25, 16), dtype=np.int16)
    levels.reshape(mbc, 400)[2, :3] = 500        # 3 escapes > 2 slots
    meta = np.zeros((mbc, 11), dtype=np.int32)
    ssim = np.zeros(mbc, dtype=np.int32)
    head, _ = _pack(levels, meta, ssim)
    info = unpack_head(head, mbc)
    assert info["esc_overflow"]
    assert info["ovf"][2] == 1 and info["ovf"].sum() == 1
