from nebulae_tpu.core import math as nmath  # noqa: F401
from nebulae_tpu.core.camera import Camera, OrbitCamera  # noqa: F401
from nebulae_tpu.core.scene import FlatScene, Scene  # noqa: F401
from nebulae_tpu.core.gltf import load_gltf  # noqa: F401
