from .halo import HaloAdj, build_halo_adj, build_halo_core, spmm_halo
from .hybrid_sharded import (
    HybridShardedAdj,
    build_hybrid_sharded_adj,
    spmm_hybrid_sharded,
)
from .multihost import global_mesh, host_local_mesh, init_distributed
from .restricted_sharded import (
    RestrictedShardedAdj,
    build_restricted_sharded_adj,
    spmm_restricted_sharded,
)
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
    "build_halo_core",
    "spmm_halo",
    "HybridShardedAdj",
    "build_hybrid_sharded_adj",
    "spmm_hybrid_sharded",
    "RestrictedShardedAdj",
    "build_restricted_sharded_adj",
    "spmm_restricted_sharded",
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
