"""Row-tile sharding must reproduce the single-chip kernel bit-for-bit.

Runs on the virtual 8-device CPU mesh (tests/conftest.py) with a (gop=2,
tile=4) layout: per-chip work covers 1/4 of the frame's MB rows, reference
halos ride ppermute, and the loop filter runs the global pipelined
wavefront — outputs must equal the single-device fused kernel + filter.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vp8oclenc_tpu.parallel.mesh import make_mesh

W, H = 128, 128          # mbw=8, mbh=8 -> 2 MB rows per tile chip
G = 2                    # independent GOP streams on the gop axis


def _content(seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H + 32, 0:W + 32]
    base = (110 + 70 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
            + rng.integers(0, 40, xx.shape)).clip(0, 255).astype(np.uint8)
    ref_y = base[:H, :W]
    cur_y = base[5:5 + H, 3:3 + W]          # a (3, 5) global pan
    mk_c = lambda o: (base[o:o + H // 2, o:o + W // 2] // 2 + 64)
    return ref_y, cur_y, mk_c(0), mk_c(2)


def _segq(seed):
    rng = np.random.default_rng(seed + 100)
    q = rng.integers(8, 40, (6, 4)).astype(np.int32)
    return q


def _lf(seed):
    """(2, 5, 4) [normal/weakened] filter-limit sets."""
    rng = np.random.default_rng(seed + 200)
    one = lambda: np.stack([
        rng.integers(10, 40, 4), rng.integers(20, 40, 4),
        rng.integers(15, 35, 4), rng.integers(2, 16, 4),
        rng.integers(0, 3, 4)]).astype(np.int32)
    return np.stack([one(), one()])


def _single_chip(ref, cur, segq, lf):
    """Expected outputs: fused single-device kernel + filter-from-meta."""
    from vp8oclenc_tpu.ops.inter import (build_inter_kernel,
                                         build_ref_state_kernel)
    from vp8oclenc_tpu.ops.loopfilter import filter_planes
    from vp8oclenc_tpu.tables import ARE16X16

    kern = build_inter_kernel(W, H, ssim_enabled=False)
    pyr, tbl, u_pad, v_pad = build_ref_state_kernel(W, H)(
        jnp.asarray(ref[0]), jnp.asarray(ref[1]), jnp.asarray(ref[2]))
    out = kern.pyr(
        jnp.asarray(cur[0]), jnp.asarray(cur[1]), jnp.asarray(cur[2]),
        (pyr, pyr, pyr), (tbl, tbl, tbl),
        (u_pad, u_pad, u_pad), (v_pad, v_pad, v_pad),
        jnp.asarray(np.array([True, False, False])),
        *(jnp.asarray(segq[i]) for i in range(6)), jnp.int32(-1))
    levels_pack, meta, cur_ssim, ry, ru, rv = out[:6]
    seg_ids = meta[:, 0]
    parts = meta[:, 1]
    a = jnp.abs(levels_pack.astype(jnp.int32))
    nzc = (a[:, :16, 1:].sum(axis=(1, 2)) + a[:, 16:24].sum(axis=(1, 2))
           + a[:, :16, 0].sum(axis=1) + a[:, 24].sum(axis=1))
    inner = (parts != ARE16X16) | (nzc != 0)
    from vp8oclenc_tpu.ssim_fx import WEAKEN_FX
    use = lf[1] if int(np.asarray(cur_ssim).min()) > WEAKEN_FX else lf[0]
    fy, fu, fv = filter_planes(ry, ru, rv, seg_ids, inner,
                               jnp.asarray(use[0]), jnp.asarray(use[1]),
                               jnp.asarray(use[2]), jnp.asarray(use[3]),
                               jnp.asarray(use[4]), W // 16, H // 16)
    return (np.asarray(levels_pack), np.asarray(meta),
            np.asarray(fy), np.asarray(fu), np.asarray(fv))


def test_tile_sharded_step_equals_single_chip():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vp8oclenc_tpu.ops.wire import head_size, unpack_head, unpack_levels
    from vp8oclenc_tpu.parallel.tile import (build_strips_fn,
                                             build_tile_frame_step)

    mesh = make_mesh(8, gop=G, tile=4)
    ntile = 4
    mbc_loc = (W // 16) * (H // 16) // ntile

    refs, curs, segqs, lfs = [], [], [], []
    for g in range(G):
        ref_y, cur_y, ref_c, cur_c = _content(seed=31 + g)
        refs.append((ref_y, ref_c, ref_c))
        curs.append((cur_y, cur_c, cur_c))
        segqs.append(_segq(g))
        lfs.append(_lf(g))

    gsh = NamedSharding(mesh, P("gop", "tile", None))
    place = lambda a: jax.device_put(jnp.asarray(np.stack(a)), gsh)
    ry = place([r[0] for r in refs])
    ru = place([r[1] for r in refs])
    rv = place([r[2] for r in refs])
    state = build_strips_fn(mesh, W, H)(ry, ru, rv)

    step = build_tile_frame_step(mesh, W, H)
    y = place([c[0] for c in curs])
    u = place([c[1] for c in curs])
    v = place([c[2] for c in curs])
    rvalid = jax.device_put(
        jnp.asarray(np.tile(np.array([True, False, False]), (G, 1))),
        NamedSharding(mesh, P("gop", None)))
    segq = jax.device_put(jnp.asarray(np.stack(segqs)),
                          NamedSharding(mesh, P("gop", None, None)))
    lf = jax.device_put(jnp.asarray(np.stack(lfs)),
                        NamedSharding(mesh, P("gop", None, None)))

    tfx3 = jax.device_put(jnp.full((G,), -1, jnp.int32),
                          NamedSharding(mesh, P("gop")))
    heads, bodies, _modes4, _lv, recon, _new_state = step(
        y, u, v, (state, state, state), rvalid, segq, lf, tfx3)
    heads = np.asarray(heads)
    bodies = np.asarray(bodies)
    hs = head_size(mbc_loc)
    bs = bodies.shape[1] // ntile

    for g in range(G):
        exp_levels, exp_meta, efy, efu, efv = _single_chip(
            refs[g], curs[g], segqs[g], lfs[g])
        # recon: sharded global assembly must equal the single-chip filter
        assert np.array_equal(np.asarray(recon[0][g]), efy), f"gop {g} luma"
        assert np.array_equal(np.asarray(recon[1][g]), efu), f"gop {g} u"
        assert np.array_equal(np.asarray(recon[2][g]), efv), f"gop {g} v"
        # wire: per-shard heads/bodies unpack to the single-chip levels/meta
        for t in range(ntile):
            info = unpack_head(heads[g, t * hs:(t + 1) * hs], mbc_loc)
            body_t = bodies[g, t * bs:(t + 1) * bs]
            lv = unpack_levels(info, body_t[: info["n_active"] * 16], mbc_loc)
            sl = slice(t * mbc_loc, (t + 1) * mbc_loc)
            assert np.array_equal(lv, exp_levels[sl]), f"gop {g} tile {t}"
            assert np.array_equal(info["seg"], exp_meta[sl, 0])
            assert np.array_equal(info["part"], exp_meta[sl, 1])
            assert np.array_equal(info["ref"], exp_meta[sl, 2])
            assert np.array_equal(
                info["mvs"].reshape(mbc_loc, 8),
                exp_meta[sl, 3:11].astype(np.int16))
