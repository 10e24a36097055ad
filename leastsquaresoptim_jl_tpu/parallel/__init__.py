"""Multi-chip scale-out: meshes, sharded Gram reduction, distributed LSMR.

The reference has no distributed runtime (SURVEY.md §2). Here residual rows
shard across chips via jax.sharding, collectives ride ICI via XLA; see
mesh.py and sharded.py. Multi-host initialization is plain
``jax.distributed.initialize()`` — no custom transport layer.
"""

from .mesh import initialize_multihost, make_mesh, replicated, shard_rows
from .sharded import (
    make_sharded_operator,
    sharded_gram_and_rhs,
    sharded_problem,
    solve_sharded,
)

__all__ = [
    "initialize_multihost",
    "make_mesh",
    "shard_rows",
    "replicated",
    "sharded_problem",
    "solve_sharded",
    "sharded_gram_and_rhs",
    "make_sharded_operator",
]
