"""The radiance-cache MLP (pure jnp pytree; MXU-friendly).

NRC paper architecture: 5 hidden layers x 64 wide, ReLU, linear 3-channel
output (radiance).  Compute runs in bfloat16 on the MXU with float32 params
and accumulation -- the [N, 64] x [64, 64] matmuls are exactly what the
systolic array wants; the whole network fuses into ~7 matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIDDEN = 64
DEPTH = 5


def init_mlp(key, in_dim: int, hidden: int = HIDDEN, depth: int = DEPTH, out_dim: int = 3):
    """He-initialized MLP params pytree."""
    params = []
    dims = [in_dim] + [hidden] * depth + [out_dim]
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        key, k = jax.random.split(key)
        w = jax.random.normal(k, (a, b), jnp.float32) * jnp.sqrt(2.0 / a)
        params.append({"w": w, "b": jnp.zeros((b,), jnp.float32)})
    return params


def apply_mlp(params, x, compute_dtype=jnp.bfloat16):
    """x [..., in_dim] -> radiance [..., 3] (softplus, non-negative)."""
    h = x.astype(compute_dtype)
    for i, layer in enumerate(params):
        w = layer["w"].astype(compute_dtype)
        h = jax.lax.dot_general(
            h, w, (((h.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        h = h + layer["b"]
        if i < len(params) - 1:
            h = jnp.maximum(h, 0.0).astype(compute_dtype)
    # Radiance must be non-negative; softplus keeps gradients alive near 0.
    return jax.nn.softplus(h)
