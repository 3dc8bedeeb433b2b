from nebulae_tpu.kernels.pallas_trace import (  # noqa: F401
    pack_bvh_for_pallas,
    pallas_closest_hit,
    pallas_any_hit,
)
