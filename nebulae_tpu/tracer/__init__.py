from nebulae_tpu.tracer.trace import (  # noqa: F401
    bvh_any_hit,
    bvh_closest_hit,
    bruteforce_any_hit,
    bruteforce_closest_hit,
    make_tracer,
)
