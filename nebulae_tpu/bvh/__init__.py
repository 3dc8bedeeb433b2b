from nebulae_tpu.bvh.builder import FlatBVH, build_bvh  # noqa: F401
from nebulae_tpu.bvh.cbuilder import build_bvh_fast  # noqa: F401
