"""Neural radiance cache: online-trained in-graph replacement for the
reference's closed-source RTXGI NRC (nri/nvidia/NvRtxgiNRC.cpp wraps
nrc::d3d12::Context; QueryAndTrain at DeferredRenderer.cpp:560 runs a CUDA
MLP behind the scenes).  Here the cache is a JAX pytree trained by optax
*inside the jitted frame*: query + self-training fuse with the ray batches,
and under a device mesh the MLP gradients all-reduce over ICI automatically.

Protocol mirrored from the reference's shader-side NRC API
(assets/shaders/rtxgi/Nrc.hlsli):
  * query records {position, roughness, normal, view dir, albedo, specular}
    created where paths terminate into the cache (Nrc.hlsli:450-480);
  * resolve adds query radiance x prefix throughput into the frame
    (radiance_resolve.hlsl:24-32);
  * training paths (a reduced-resolution subset) record per-vertex radiance
    and throughput, targets accumulate suffix radiance, and the tail
    self-trains from the cache's own query (Nrc.hlsli:529-551);
  * spread-based termination decides the query vertex (Nrc.hlsli:200-203,
    357-370): terminate once cumulative spread > c * primary spread.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from nebulae_tpu.nrc.encoding import encode_query, encoded_dim
from nebulae_tpu.nrc.mlp import apply_mlp, init_mlp


@dataclass(frozen=True)
class NRCConfig:
    hidden: int = 64
    depth: int = 5
    learning_rate: float = 2e-3
    ema: float = 0.99  # EMA of params used for rendering (paper trick)


def make_optimizer(learning_rate: float):
    """The cache optimizer: adam behind global-norm clipping.

    HDR radiance targets occasionally spike (specular NEE through a grazing
    GGX lobe); without clipping those spikes whiplash the adam moments and
    the loss oscillates by 3 orders of magnitude frame to frame."""
    return optax.chain(optax.clip_by_global_norm(1.0), optax.adam(learning_rate))


def init_cache(seed: int, nrc_cfg: NRCConfig = NRCConfig()):
    """Returns dict(params, ema_params, opt_state)."""
    params = init_mlp(jax.random.PRNGKey(seed), encoded_dim(), nrc_cfg.hidden, nrc_cfg.depth)
    opt = make_optimizer(nrc_cfg.learning_rate)
    opt_state = opt.init(params)
    ema_params = jax.tree.map(lambda x: x, params)
    return {"params": params, "ema_params": ema_params, "opt_state": opt_state}


def modulation_factor(albedo, metalness):
    """The learnIrradiance (de)modulation term: specularF0 + diffuseReflectance
    at a vertex (Nrc.hlsli:452 -- the reference's query prefixThroughput is
    multiplied by this when learnIrradiance is on, i.e. the cache learns
    radiance DIVIDED by it, so textures/material color factor out of the MLP
    instead of being memorized).  Floored so black-metal vertices cannot
    blow up the demodulated targets."""
    from nebulae_tpu.core import brdf

    f = brdf.base_f0(albedo, metalness, jnp) + brdf.diffuse_reflectance(
        albedo, metalness, jnp
    )
    return jnp.maximum(f, 1e-2)


def query_cache(params, surf: dict, view, aabb_min, aabb_max, learn_irradiance: bool = True):
    """Predict radiance leaving surface toward `view`. All [..., C] arrays.

    With `learn_irradiance` (the reference's live configuration,
    DeferredRenderer.cpp:105) the MLP's raw output is demodulated irradiance;
    the prediction is re-modulated by the vertex's (F0 + diffuse reflectance)
    here, mirroring the SDK resolve (NvRtxgiNRC.cpp:150-153 adds
    queryRadiance x prefixThroughput with the factor folded into
    prefixThroughput, Nrc.hlsli:452)."""
    from nebulae_tpu.core import brdf

    specular = brdf.base_f0(surf["albedo"], surf["metalness"], jnp)
    x = encode_query(
        surf["position"], surf["normal_s"], view, surf["roughness"], surf["albedo"],
        specular, aabb_min, aabb_max,
    )
    pred = apply_mlp(params, x)
    if learn_irradiance:
        pred = pred * modulation_factor(surf["albedo"], surf["metalness"])
    return pred


def train_cache_step(cache_state, optimizer, records: dict, aabb_min, aabb_max,
                     learn_irradiance: bool = True):
    """One adam step on the cache MLP from training records.

    records: dict of [B, ...] arrays -- position, normal, view, roughness,
    albedo, metalness, target (radiance), weight (0 masks invalid records).
    With `learn_irradiance` the target is demodulated by the record vertex's
    (F0 + diffuse reflectance) before the loss -- the training-side half of
    the reference's learnIrradiance protocol (NrcCommon.h:126-131 "requires
    albedo demodulation"; the closed SDK does this from the per-vertex
    albedo/specular record fields).  Returns (new_cache_state, loss).
    """
    from nebulae_tpu.core import brdf

    specular = brdf.base_f0(records["albedo"], records["metalness"], jnp)
    x = encode_query(
        records["position"], records["normal"], records["view"], records["roughness"],
        records["albedo"], specular, aabb_min, aabb_max,
    )
    target = jax.lax.stop_gradient(records["target"])
    if learn_irradiance:
        target = target / jax.lax.stop_gradient(
            modulation_factor(records["albedo"], records["metalness"])
        )
    w = records["weight"]

    def loss_fn(params):
        pred = apply_mlp(params, x)
        # Relative L2 (NRC paper): stabilizes HDR targets.
        denom = jax.lax.stop_gradient(pred) ** 2 + 1e-2
        err = ((pred - target) ** 2 / denom).mean(-1) * w
        return err.sum() / jnp.maximum(w.sum(), 1.0)

    loss, grads = jax.value_and_grad(loss_fn)(cache_state["params"])
    updates, opt_state = optimizer.update(grads, cache_state["opt_state"], cache_state["params"])
    params = optax.apply_updates(cache_state["params"], updates)
    ema = jax.tree.map(lambda e, p: e * 0.99 + p * 0.01, cache_state["ema_params"], params)
    return {"params": params, "ema_params": ema, "opt_state": opt_state}, loss


def memory_footprint(cache_state: dict) -> dict:
    """Byte accounting of the cache, mirroring the reference's
    `GetMemoryFootprint` query (nri/nvidia/NvRtxgiNRC.cpp:160-164, logged at
    startup).  Returns {params, ema_params, opt_state, total} in bytes."""
    def nbytes(tree):
        return int(sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)))

    out = {k: nbytes(v) for k, v in cache_state.items()}
    out["total"] = sum(out.values())
    return out


def spread_term(hit_dist, cos_gamma, pdf):
    """Per-vertex spread increment: hitDist / sqrt(cos * pdf)
    (Nrc.hlsli:357-370's cumulative-spread term)."""
    return hit_dist / jnp.sqrt(jnp.maximum(cos_gamma * pdf, 1e-6))


def primary_spread(hit_dist, cos_gamma):
    """Primary-vertex spread: hitDist / sqrt(cos / 4pi) (Nrc.hlsli:200-203)."""
    return hit_dist / jnp.sqrt(jnp.maximum(cos_gamma / (4.0 * jnp.pi), 1e-6))
