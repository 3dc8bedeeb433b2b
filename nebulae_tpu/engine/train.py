"""Differentiable-rendering training step (inverse rendering).

The capability the reference cannot express: optimize scene parameters
(material tables, sun/sky) and -- with NRC enabled -- the radiance-cache MLP
by gradient descent on a rendered-image loss.  One jitted step =
forward render + backward through the whole pipeline + optax update; under a
device mesh the pixel dimension shards and XLA all-reduces parameter
gradients over ICI automatically (replicated params + sharded loss).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from nebulae_tpu.config import RenderConfig
from nebulae_tpu.engine.renderer import render_frame

# Scene tables that are trainable (the reference's material factors,
# Material.h:31-49, promoted to first-class parameters).
TRAINABLE_SCENE_KEYS = ("mat_base_color", "mat_metallic", "mat_roughness", "mat_emissive")


def split_scene_params(scene: dict):
    """Split a scene dict into (trainable params, frozen arrays)."""
    params = {k: scene[k] for k in TRAINABLE_SCENE_KEYS}
    frozen = {k: v for k, v in scene.items() if k not in TRAINABLE_SCENE_KEYS}
    return params, frozen


def clamp_scene_params(params: dict) -> dict:
    """Project material parameters back to their physical ranges."""
    out = dict(params)
    if "mat_base_color" in out:
        out["mat_base_color"] = jnp.clip(out["mat_base_color"], 0.0, 1.0)
    if "mat_metallic" in out:
        out["mat_metallic"] = jnp.clip(out["mat_metallic"], 0.0, 1.0)
    if "mat_roughness" in out:
        out["mat_roughness"] = jnp.clip(out["mat_roughness"], 0.02, 1.0)
    if "mat_emissive" in out:
        out["mat_emissive"] = jnp.maximum(out["mat_emissive"], 0.0)
    return out


def render_loss(params, frozen_scene, bvh, cam, state, target, cfg: RenderConfig, train_sun: bool):
    scene = dict(frozen_scene)
    scene.update({k: v for k, v in params.items() if k != "sun"})
    sun = params["sun"]
    if cfg.lean_outputs or cfg.svgf_pallas:
        # lean_outputs: the loss needs the linear denoised/hdr image, not the
        # presented ldr; XLA dead-code-eliminates debug outputs under grad.
        # svgf_pallas: the fused stencil wins forward-only (77 vs 93 ms for
        # the 1080p cascade on v5e) but its custom transposed-stencil VJP
        # loses badly to XLA autodiff of the shift/accumulate form (192 vs
        # 117 ms fwd+bwd) -- XLA fuses the forward and transpose passes
        # across iterations.  Train differentiates, so it takes the XLA path.
        import dataclasses

        cfg = dataclasses.replace(cfg, lean_outputs=False, svgf_pallas=False)
    out, new_state = render_frame(scene, bvh, sun, cam, state, cfg)
    img = out["denoised"] if cfg.enable_svgf else out["hdr"]
    loss = jnp.mean((img - target) ** 2)
    return loss, (new_state, img)


def make_train_step(cfg: RenderConfig, frozen_scene: dict, bvh: dict | None, optimizer=None, train_sun: bool = True):
    """Build a jittable train step closure.

    step(params, opt_state, cam, state, target) ->
        (params, opt_state, state, loss, img)
    """
    if optimizer is None:
        optimizer = optax.adam(1e-2)

    def step(params, opt_state, cam, state, target):
        (loss, (new_state, img)), grads = jax.value_and_grad(
            partial(render_loss, cfg=cfg, train_sun=train_sun), has_aux=True
        )(params, frozen_scene, bvh, cam, state, target)
        if not train_sun:
            grads = dict(grads)
            grads["sun"] = jax.tree.map(jnp.zeros_like, grads["sun"])
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = {**clamp_scene_params({k: v for k, v in params.items() if k != "sun"}), "sun": params["sun"]}
        return params, opt_state, new_state, loss, img

    return step, optimizer
