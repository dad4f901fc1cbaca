from .halo import HaloAdj, build_halo_adj, spmm_halo
from .multihost import global_mesh, host_local_mesh, init_distributed
from .tensor import apply_tp, tp_param_shardings
from .sharded import (
    ShardedAdj,
    build_sharded_adj,
    make_mesh,
    put_global,
    replicate_global,
)

__all__ = [
    "HaloAdj",
    "build_halo_adj",
    "spmm_halo",
    "ShardedAdj",
    "build_sharded_adj",
    "make_mesh",
    "put_global",
    "replicate_global",
    "init_distributed",
    "global_mesh",
    "host_local_mesh",
    "apply_tp",
    "tp_param_shardings",
]
