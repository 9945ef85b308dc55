"""Device mesh construction for multi-chip encoding.

Axes (the encoder's parallelism inventory, SURVEY.md §2.4):
  * gop  — data parallelism over independent keyframe-aligned GOPs
           (no cross-chip traffic; the reference has no equivalent)
  * tile — in-frame row-tile parallelism (sequence-parallel analog); frame
           rows are sharded, psum/all_gather/ppermute ride ICI
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, gop: int | None = None,
              tile: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if gop is None or tile is None:
        # favor GOP parallelism (no communication), keep tile a small factor
        tile = tile or (2 if n % 2 == 0 and n > 1 else 1)
        gop = n // tile
    assert gop * tile == n, f"mesh {gop}x{tile} != {n} devices"
    arr = np.asarray(devs).reshape(gop, tile)
    return Mesh(arr, axis_names=("gop", "tile"))


def gop_sharding(mesh: Mesh) -> NamedSharding:
    """Batched frames (G, H, W): G over gop, rows over tile."""
    return NamedSharding(mesh, P("gop", "tile", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
