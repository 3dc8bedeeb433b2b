"""Parity of the fused Pallas a-trous stencil vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nebulae_tpu.config import RenderConfig
from nebulae_tpu.kernels.pallas_svgf import atrous_step_pallas
from nebulae_tpu.passes.svgf import svgf_atrous_step


def _inputs(h, w, seed=0):
    rng = np.random.default_rng(seed)
    radiance = jnp.asarray(rng.random((h, w, 3), np.float32))
    variance = jnp.asarray(rng.random((h, w), np.float32) * 0.01 + 1e-4)
    depth = jnp.asarray(1.0 + rng.random((h, w), np.float32) * 10)
    n = rng.standard_normal((h, w, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return radiance, variance, depth, jnp.asarray(n)


@pytest.mark.parametrize("step", [1, 2, 4, 8])
def test_atrous_parity_fwd(step):
    cfg = RenderConfig()
    radiance, variance, depth, normal = _inputs(40, 56)
    ref = svgf_atrous_step(radiance, variance, depth, normal, step, cfg)
    out = atrous_step_pallas(radiance, variance, depth, normal, step, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_atrous_parity_odd_shape():
    """Non-multiple-of-16 rows, non-128 cols exercise padding/fixup paths."""
    cfg = RenderConfig()
    radiance, variance, depth, normal = _inputs(37, 53, seed=3)
    for step in (1, 8):
        ref = svgf_atrous_step(radiance, variance, depth, normal, step, cfg)
        out = atrous_step_pallas(radiance, variance, depth, normal, step, cfg, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("step", [1, 4])
def test_atrous_parity_grad(step):
    """Transposed-stencil VJP matches autodiff through the XLA path."""
    cfg = RenderConfig()
    radiance, variance, depth, normal = _inputs(32, 48, seed=7)
    w = jnp.asarray(np.random.default_rng(9).random((32, 48, 3), np.float32))

    def loss_ref(r):
        return (svgf_atrous_step(r, variance, depth, normal, step, cfg) * w).sum()

    def loss_pl(r):
        return (atrous_step_pallas(r, variance, depth, normal, step, cfg, interpret=True) * w).sum()

    g_ref = jax.grad(loss_ref)(radiance)
    g_pl = jax.grad(loss_pl)(radiance)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), rtol=3e-5, atol=3e-6)


def test_atrous_grad_of_weights_inputs_is_zero():
    """variance/depth/normal are detached in both implementations."""
    cfg = RenderConfig()
    radiance, variance, depth, normal = _inputs(32, 48, seed=11)

    def loss(v, d, n):
        return atrous_step_pallas(radiance, v, d, n, 2, cfg, interpret=True).sum()

    gv, gd, gn = jax.grad(loss, argnums=(0, 1, 2))(variance, depth, normal)
    assert float(jnp.abs(gv).max()) == 0.0
    assert float(jnp.abs(gd).max()) == 0.0
    assert float(jnp.abs(gn).max()) == 0.0
