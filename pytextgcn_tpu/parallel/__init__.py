from .multihost import global_mesh, host_local_mesh, init_distributed
from .sharded import ShardedAdj, build_sharded_adj, make_mesh

__all__ = [
    "ShardedAdj",
    "build_sharded_adj",
    "make_mesh",
    "init_distributed",
    "global_mesh",
    "host_local_mesh",
]
