from .sharded import ShardedAdj, build_sharded_adj, make_mesh

__all__ = ["ShardedAdj", "build_sharded_adj", "make_mesh"]
