"""ACES filmic tonemapping (fitted RRT+ODT) -- assets/shaders/tonemapping.hlsl.

Stephen Hill's fitted ACES matrices (public, widely reproduced); operates on
linear HDR [..., 3] and returns display-linear [0, 1] values.  The final sRGB
encode is a separate step (core.texture.linear_to_srgb) because the reference
writes to an sRGB-typed backbuffer.

The 3x3 color transforms are unrolled to elementwise arithmetic rather than
matmuls: on TPU a [N,3]x[3,3] dot would route through the MXU (bf16 inputs,
0.4% error) and on CPU XLA reassociates -- elementwise keeps the jax and
numpy paths bit-comparable and fuses into the surrounding pipeline.
"""

from __future__ import annotations

import numpy as np

_ACES_IN = (
    (0.59719, 0.35458, 0.04823),
    (0.07600, 0.90834, 0.01566),
    (0.02840, 0.13383, 0.83777),
)

_ACES_OUT = (
    (1.60475, -0.53108, -0.07367),
    (-0.10208, 1.10813, -0.00605),
    (-0.00327, -0.07276, 1.07602),
)


def _mat3(m, r, g, b, xp):
    return xp.stack(
        [
            r * m[0][0] + g * m[0][1] + b * m[0][2],
            r * m[1][0] + g * m[1][1] + b * m[1][2],
            r * m[2][0] + g * m[2][1] + b * m[2][2],
        ],
        axis=-1,
    )


def _rrt_odt_fit(v):
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return a / b


def _tonemap(hdr, xp):
    r, g, b = hdr[..., 0], hdr[..., 1], hdr[..., 2]
    v = _mat3(_ACES_IN, r, g, b, xp)
    v = _rrt_odt_fit(v)
    v = _mat3(_ACES_OUT, v[..., 0], v[..., 1], v[..., 2], xp)
    return xp.clip(v, 0.0, 1.0)


def aces_tonemap(hdr):
    """[..., 3] linear HDR -> [..., 3] display-linear in [0, 1] (jax)."""
    import jax.numpy as jnp

    return _tonemap(hdr, jnp)


def aces_tonemap_np(hdr):
    return _tonemap(np.asarray(hdr, np.float32), np)
