from nebulae_tpu.engine.renderer import Renderer, render_frame  # noqa: F401
