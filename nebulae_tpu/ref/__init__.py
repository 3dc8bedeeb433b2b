from nebulae_tpu.ref.tracer import (  # noqa: F401
    intersect_any_np,
    intersect_closest_np,
    render_gbuffer_np,
    render_direct_np,
    path_trace_np,
)
