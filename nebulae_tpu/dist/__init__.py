from nebulae_tpu.dist.mesh import make_mesh, shard_pixels, replicated  # noqa: F401
