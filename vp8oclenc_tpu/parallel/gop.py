"""Multi-chip encode step: GOP-sharded pixel pipeline with tile-sharded
frame statistics.

The full per-frame step is expressed once over a (gop, tile) mesh with
shard_map:

  * frame batches are sharded over `gop` (independent GOP streams — pure
    data parallelism, zero ICI traffic for the pixel kernels);
  * frame rows are sharded over `tile`: the scene-change / filter-strength
    statistics are computed tile-locally and reduced with `psum` over ICI;
    the pixel step all-gathers the row shards (sequence-parallel
    gather-compute pattern) before running the fused inter kernel.

Tile-halo ME (ppermute ref-row halos instead of the all-gather) is the
round-2 refinement; the collective structure and shardings here are the real
ones the driver dry-runs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map_mod
    shard_map = _shard_map_mod
except ImportError:
    from jax.experimental.shard_map import shard_map


def build_multichip_step(mesh: Mesh, wrk_w: int, wrk_h: int,
                         ssim_enabled: bool = False):
    """Returns the jitted multichip step fn.

    Arrays are batched over G (the gop axis) and sharded (G over gop, rows
    over tile).  Returns per-GOP encoded-frame tensors + psum'd frame stats.
    ssim_enabled must match the config (False when ssim_target < 0) so an
    SSIM-off run neither pays the intra-replace compute nor mutates parts
    for MBs whose Q15 score happens to be <= -1."""
    from vp8oclenc_tpu.ops import inter as OPS
    raw_kernel = OPS.build_inter_kernel(wrk_w, wrk_h, ssim_enabled=ssim_enabled)
    ntile = mesh.shape["tile"]

    def per_frame(y, u, v, refs_y, refs_u, refs_v, ref_valid, q, ssim_t):
        return raw_kernel(y, u, v, refs_y, refs_u, refs_v, ref_valid,
                          q[0], q[1], q[2], q[3], q[4], q[5], ssim_t)

    def local_step(y, u, v, refs_y, refs_u, refs_v, ref_valid, q, ssim_t,
                   prev_u, prev_v):
        # ---- tile-sharded statistics, reduced over ICI ----
        # scene change: mean |chroma diff| vs previous frame (vp8enc.cpp:265)
        udiff = jnp.abs(u.astype(jnp.int32) - prev_u.astype(jnp.int32)) \
            .sum(axis=(1, 2))
        vdiff = jnp.abs(v.astype(jnp.int32) - prev_v.astype(jnp.int32)) \
            .sum(axis=(1, 2))
        udiff = jax.lax.psum(udiff, "tile")
        vdiff = jax.lax.psum(vdiff, "tile")
        # filter strength: frame brightness sum (vp8enc.cpp:96)
        ysum = jax.lax.psum(y.astype(jnp.int32).sum(axis=(1, 2)), "tile")

        # ---- sequence-parallel gather-compute for the pixel step ----
        yf = jax.lax.all_gather(y, "tile", axis=1, tiled=True)
        uf = jax.lax.all_gather(u, "tile", axis=1, tiled=True)
        vf = jax.lax.all_gather(v, "tile", axis=1, tiled=True)
        ryf = jax.lax.all_gather(refs_y, "tile", axis=2, tiled=True)
        ruf = jax.lax.all_gather(refs_u, "tile", axis=2, tiled=True)
        rvf = jax.lax.all_gather(refs_v, "tile", axis=2, tiled=True)

        out = jax.vmap(per_frame, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))(
            yf, uf, vf, ryf, ruf, rvf,
            jnp.broadcast_to(ref_valid, (yf.shape[0], 3)), q, ssim_t)
        (levels_pack, meta, cur_ssim, recon_y, recon_u, recon_v,
         _modes4, _replaced) = out

        # tile shard of the recon planes stays resident on this chip
        ti = jax.lax.axis_index("tile")
        rows_l = recon_y.shape[1] // ntile
        recon_y_l = jax.lax.dynamic_slice_in_dim(recon_y, ti * rows_l, rows_l, 1)
        rows_c = recon_u.shape[1] // ntile
        recon_u_l = jax.lax.dynamic_slice_in_dim(recon_u, ti * rows_c, rows_c, 1)
        recon_v_l = jax.lax.dynamic_slice_in_dim(recon_v, ti * rows_c, rows_c, 1)

        return (levels_pack, meta, cur_ssim, recon_y_l, recon_u_l, recon_v_l,
                udiff, vdiff, ysum)

    g = P("gop", "tile", None)
    g3 = P("gop", None, "tile", None)
    rep = P()
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(g, g, g, g3, g3, g3, P("gop", None), rep, rep, g, g),
        out_specs=(P("gop", None, None, None), P("gop", None, None),
                   P("gop", None),
                   g, g, g, P("gop"), P("gop"), P("gop")),
        check_vma=False)
    return jax.jit(step)


def example_inputs(mesh: Mesh, wrk_w: int, wrk_h: int, G: int):
    import numpy as np
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.integers(0, 255, s, dtype=np.uint8))
    y = mk(G, wrk_h, wrk_w)
    u = mk(G, wrk_h // 2, wrk_w // 2)
    v = mk(G, wrk_h // 2, wrk_w // 2)
    refs_y = mk(G, 3, wrk_h, wrk_w)
    refs_u = mk(G, 3, wrk_h // 2, wrk_w // 2)
    refs_v = mk(G, 3, wrk_h // 2, wrk_w // 2)
    ref_valid = jnp.ones((G, 3), dtype=bool)
    q = jnp.asarray(np.tile(np.array([8, 10, 16, 12, 8, 10], np.int32)[:, None], (1, 4)))
    ssim_t = jnp.int32(-1)      # Q15 3-plane threshold; -1 = SSIM off
    prev_u, prev_v = u, v
    from vp8oclenc_tpu.parallel.mesh import gop_sharding
    sh = gop_sharding(mesh)
    sh3 = NamedSharding(mesh, P("gop", None, "tile", None))
    place = lambda a, s: jax.device_put(a, s)
    return (place(y, sh), place(u, sh), place(v, sh),
            place(refs_y, sh3), place(refs_u, sh3), place(refs_v, sh3),
            jax.device_put(ref_valid, NamedSharding(mesh, P("gop", None))),
            jax.device_put(q, NamedSharding(mesh, P())),
            jax.device_put(ssim_t, NamedSharding(mesh, P())),
            place(prev_u, sh), place(prev_v, sh))
