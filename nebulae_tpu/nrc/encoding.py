"""Input encodings for the neural radiance cache.

Follows the NRC recipe the reference consumes through the closed RTXGI DLL
(protocol in assets/shaders/rtxgi/NrcStructures.h:94-169: query records carry
position, roughness, spherical normal + view dir, albedo, specular): position
gets a triangle-wave frequency encoding, directions get oct-mapped one-blob
encodings, roughness gets 1 - exp(-r).  These are the *original NRC paper's*
encodings -- and unlike hash grids they are pure elementwise math, which on
TPU matters: no gathers, fuses straight into the MLP's first matmul.

Positions are normalized to [0, 1] by the scene AABB first (the scale/bias
protocol of NrcHelpers.hlsli:482-490).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nebulae_tpu.core import math as nmath

N_FREQ = 12  # triangle-wave frequencies per position axis
N_BLOB = 4  # one-blob bins per direction component


def normalize_position(p, aabb_min, aabb_max):
    ext = jnp.maximum(aabb_max - aabb_min, 1e-6)
    return jnp.clip((p - aabb_min) / ext, 0.0, 1.0)


def triangle_wave_encode(x, n_freq: int = N_FREQ):
    """x in [0,1] [..., D] -> [..., D*n_freq] triangle waves at 2^k freq."""
    outs = []
    for k in range(n_freq):
        v = x * (2.0 ** k)
        tri = jnp.abs(2.0 * (v - jnp.floor(v + 0.5)))  # triangle in [0,1]
        outs.append(tri)
    return jnp.concatenate(outs, axis=-1)


def oneblob_encode(x, n_bins: int = N_BLOB):
    """x in [0,1] [..., D] -> [..., D*n_bins] gaussian one-blob."""
    centers = (np.arange(n_bins, dtype=np.float32) + 0.5) / n_bins
    sigma = 1.0 / n_bins
    d = x[..., :, None] - jnp.asarray(centers)  # [..., D, B]
    blob = jnp.exp(-0.5 * (d / sigma) ** 2)
    return blob.reshape(*x.shape[:-1], x.shape[-1] * n_bins)


def unit_to_01(d):
    """Unit vector -> oct coords in [0,1]^2."""
    e = nmath.oct_encode(d, jnp)
    return e * 0.5 + 0.5


def encode_query(position, normal, view, roughness, albedo, specular, aabb_min, aabb_max):
    """Build the cache MLP input from a query record.

    Returns [..., F] with F = 3*N_FREQ + 2*2*N_BLOB + 1 + 3 + 3.
    """
    p01 = normalize_position(position, aabb_min, aabb_max)
    parts = [
        triangle_wave_encode(p01),
        oneblob_encode(unit_to_01(normal)),
        oneblob_encode(unit_to_01(view)),
        1.0 - jnp.exp(-roughness[..., None]),
        albedo,
        specular,
    ]
    return jnp.concatenate(parts, axis=-1)


def encoded_dim() -> int:
    return 3 * N_FREQ + 2 * 2 * N_BLOB + 1 + 3 + 3
