from .mesh import make_mesh, shard_batch, replicate, fsdp_shard_params  # noqa: F401
