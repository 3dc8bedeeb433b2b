from nebulae_tpu.passes.gbuffer import make_camera_arrays, render_gbuffer  # noqa: F401
from nebulae_tpu.passes.direct import shade_direct  # noqa: F401
from nebulae_tpu.passes.pathtrace import path_trace  # noqa: F401
from nebulae_tpu.passes.svgf import svgf_atrous, svgf_temporal  # noqa: F401
from nebulae_tpu.passes.tonemap import aces_tonemap  # noqa: F401
