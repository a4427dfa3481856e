"""Parallel execution: 2-D spatial domain decomposition over a device mesh.

The communication layer the reference lacks (SURVEY.md §2.3): halo exchange
via ``lax.ppermute`` (parallel.halo) and shard_map-wrapped filter engines
(parallel.sharded), with the tripolar north fold expressed as a reversed
ppermute pairing among top-row devices.
"""

from .halo import fold_row, north_neighbor_sharded, shifted
from .sharded import make_sharded_scalar_apply, make_sharded_vector_apply

__all__ = [
    "shifted",
    "fold_row",
    "north_neighbor_sharded",
    "make_sharded_scalar_apply",
    "make_sharded_vector_apply",
]
