from nebulae_tpu.bvh.builder import FlatBVH, build_bvh  # noqa: F401
