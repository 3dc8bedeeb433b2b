"""Primary-visibility G-buffer pass (differentiable).

TPU-native replacement for the reference's raster G-buffer
(assets/shaders/deferred_gbuffers.hlsl + DeferredRenderer's MRT setup,
DeferredRenderer.cpp:758-772): instead of rasterizing ~100 submeshes we cast
one primary ray per pixel through the BVH and reconstruct the same four
targets (albedo, roughness/metalness, world position, geometric+shading
normals) plus depth and a hit mask.

Differentiability: the *intersection* (which triangle, barycentrics, t) is
detached -- gradients flow through surface attributes (materials, textures)
only.  This is the documented "detached visibility" stance (SURVEY.md
section 7): exactly what material/light/MLP gradients need.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nebulae_tpu.core import math as nmath
from nebulae_tpu.core.surface import reconstruct_surface


def detach(tree):
    return jax.tree.map(jax.lax.stop_gradient, tree)


def make_camera_arrays(camera, width: int, height: int) -> dict:
    """Host-side: turn a core.camera.Camera into jit-friendly arrays."""
    right, up, fwd = camera.basis()
    view = camera.view_matrix()
    proj = camera.proj_matrix(width, height)
    return {
        "eye": jnp.asarray(camera.eye, jnp.float32),
        "right": jnp.asarray(right),
        "up": jnp.asarray(up),
        "fwd": jnp.asarray(fwd),
        "tan_half": jnp.float32(np.tan(np.deg2rad(camera.fov_y_deg) * 0.5)),
        "aspect": jnp.float32(width / height),
        # view-projection for temporal reprojection (math convention)
        "viewproj": jnp.asarray(proj @ view, jnp.float32),
    }


def camera_rays_jax(cam: dict, width: int, height: int, jitter=None):
    """Primary ray generation inside jit (differentiable w.r.t. camera)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32), jnp.arange(width, dtype=jnp.float32), indexing="ij"
    )
    xs = xs.reshape(-1)
    ys = ys.reshape(-1)
    if jitter is None:
        jx = jy = 0.5
    else:
        jx, jy = jitter[..., 0], jitter[..., 1]
    u = ((xs + jx) / width * 2.0 - 1.0) * cam["tan_half"] * cam["aspect"]
    v = (1.0 - (ys + jy) / height * 2.0) * cam["tan_half"]
    d = u[:, None] * cam["right"][None] + v[:, None] * cam["up"][None] + cam["fwd"][None]
    d = nmath.normalize(d)
    o = jnp.broadcast_to(cam["eye"], d.shape)
    return o, d


def pick_block(height: int, width: int):
    """Largest benchmarked pixel-block shape dividing the frame, or None.

    Primary rays in row-major order give each [8,128] traversal packet a
    1024x1-pixel sliver (~a third of the screen width of frustum); re-tiling
    into compact blocks before packing halves the primary trace (measured
    114 -> 57 ms at 1080p on v5e).  Pure reshape/transpose both ways."""
    for bh, bw in ((40, 32), (32, 32), (24, 64), (16, 64), (8, 128), (8, 64), (8, 32)):
        if height % bh == 0 and width % bw == 0:
            return bh, bw
    return None


def to_blocks(x, height, width, bh, bw):
    """[H*W, ...] row-major -> block-major order (no gathers)."""
    s = x.shape[1:]
    return (
        x.reshape(height // bh, bh, width // bw, bw, *s)
        .transpose(0, 2, 1, 3, *range(4, 4 + len(s)))
        .reshape(height * width, *s)
    )


def from_blocks(x, height, width, bh, bw):
    s = x.shape[1:]
    return (
        x.reshape(height // bh, width // bw, bh, bw, *s)
        .transpose(0, 2, 1, 3, *range(4, 4 + len(s)))
        .reshape(height * width, *s)
    )


def blocked_closest(closest_fn, height: int, width: int):
    """Wrap a closest-hit tracer to run in pixel-block order (hit records are
    returned in the caller's row-major order; results are order-invariant)."""
    blk = pick_block(height, width)
    if blk is None:
        return closest_fn
    bh, bw = blk

    def fn(o, d):
        hit = closest_fn(to_blocks(o, height, width, bh, bw), to_blocks(d, height, width, bh, bw))
        return {k: from_blocks(v, height, width, bh, bw) for k, v in hit.items()}

    return fn


def render_gbuffer(scene: dict, closest_fn, o, d, image_hw=None):
    """Trace primary rays -> G-buffer dict (flat [N, ...] layout).

    `image_hw` (h, w) enables per-pixel texture mip selection from
    screen-space UV derivatives (core.surface.mip_level_from_uv) -- the
    software analogue of the raster G-buffer's hardware mips
    (deferred_gbuffers.hlsl:72-90).  Requires row-major rays."""
    hit = detach(closest_fn(jax.lax.stop_gradient(o), jax.lax.stop_gradient(d)))
    valid = hit["tri"] >= 0
    mip = None
    if (
        image_hw is not None
        and "mat_tex_mip_ids" in scene
        and scene["textures"].shape[0] > 0
    ):
        from nebulae_tpu.core.surface import mip_level_from_uv

        mip = mip_level_from_uv(
            scene, hit["tri"], hit["u"], hit["v"], image_hw[0], image_hw[1], xp=jnp
        )
    surf = reconstruct_surface(
        scene, hit["tri"], hit["u"], hit["v"], view_dir=-d, xp=jnp, mip_level=mip
    )
    zero3 = jnp.zeros_like(surf["position"])
    vm = valid[..., None]
    return {
        "hit": valid,
        "depth": jnp.where(valid, hit["t"], jnp.inf),
        "position": jnp.where(vm, surf["position"], zero3),
        "normal_g": jnp.where(vm, surf["normal_g"], 0.0),
        "normal_s": jnp.where(vm, surf["normal_s"], 0.0),
        "albedo": jnp.where(vm, surf["albedo"], 0.0),
        "roughness": jnp.where(valid, surf["roughness"], 1.0),
        "metalness": jnp.where(valid, surf["metalness"], 0.0),
        "emissive": jnp.where(vm, surf["emissive"], 0.0),
        "view": -d,
        "ray_o": o,
        "ray_d": d,
    }
