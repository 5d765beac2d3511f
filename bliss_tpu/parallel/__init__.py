"""Device-mesh parallelism: sharded batch analysis + sharded playlist math."""

from .mesh import (
    make_mesh,
    sharded_analyze_batch,
    sharded_closest_distances,
    sharded_top_k,
)

__all__ = [
    "make_mesh",
    "sharded_analyze_batch",
    "sharded_closest_distances",
    "sharded_top_k",
]
