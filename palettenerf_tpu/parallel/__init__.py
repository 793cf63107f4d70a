from .mesh import make_mesh, replicated, shard_batch, shard_rays

__all__ = ["make_mesh", "replicated", "shard_batch", "shard_rays"]
