"""Nebulae-TPU: a TPU-native differentiable path tracing framework.

Built from scratch in JAX/XLA/Pallas with the pipeline capabilities of the
Nebulae D3D12/DXR renderer (see SURVEY.md): glTF scene import and SoA
flattening, BVH-accelerated wavefront path tracing, deferred G-buffer +
Cook-Torrance PBR direct lighting with sun-disk NEE, an online-trained neural
radiance cache, SVGF temporal + a-trous denoising, and ACES tonemapping --
all differentiable end-to-end and sharded across TPU meshes.
"""

__version__ = "0.1.0"
