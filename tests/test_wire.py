"""Device wire-format round trip: pack on (CPU) jax, unpack with numpy."""
import numpy as np

from vp8oclenc_tpu.ops.wire import pack_wire, unpack_wire, wire_size


def test_wire_roundtrip():
    rng = np.random.default_rng(3)
    mbc = 60
    levels = (rng.integers(-60, 60, (mbc, 25, 16))
              * (rng.random((mbc, 25, 16)) > 0.8)).astype(np.int16)
    # escapes: scatter some large values (|v| > 127), <= 16 per MB
    for mbn in range(0, mbc, 3):
        k = int(rng.integers(1, 16))
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
    ssim = rng.random(mbc).astype(np.float32)

    import jax.numpy as jnp
    buf = np.asarray(pack_wire(jnp.asarray(levels), jnp.asarray(meta),
                               jnp.asarray(ssim)))
    assert buf.size == wire_size(mbc)

    lv, s2, p2, r2, mv2, ovf, ss2 = unpack_wire(buf, mbc)
    assert not ovf.any()
    assert np.array_equal(lv, levels)
    assert np.array_equal(s2, seg)
    assert np.array_equal(p2, part)
    assert np.array_equal(r2, ref)
    assert np.array_equal(mv2.reshape(mbc, 8), mvs.astype(np.int16))
    assert np.allclose(ss2, ssim, atol=1e-7)


def test_wire_overflow_flag():
    import jax.numpy as jnp
    mbc = 4
    levels = np.zeros((mbc, 25, 16), dtype=np.int16)
    levels.reshape(mbc, 400)[2, :20] = 500       # 20 escapes > 16 slots
    meta = np.zeros((mbc, 11), dtype=np.int32)
    ssim = np.zeros(mbc, dtype=np.float32)
    buf = np.asarray(pack_wire(jnp.asarray(levels), jnp.asarray(meta),
                               jnp.asarray(ssim)))
    *_, ovf, _ = unpack_wire(buf, mbc)
    assert ovf[2] == 1 and ovf.sum() == 1
