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
    """[..., 3] linear HDR -> [..., 3] display-linear in [0, 1] (jax).

    Computed channel-planar: interleaved [..., 3] keeps the lane dimension at
    3/128 occupancy on the VPU, so the per-channel mixes run ~8x slower than
    the same arithmetic on [3, N] planes (measured 12.5 -> ~3 ms at 1080p).
    The two transposes move values untouched, so results stay bit-identical
    to the numpy path."""
    import jax.numpy as jnp

    shape = hdr.shape
    flat = hdr.reshape(-1, 3)
    if flat.shape[0] < 1024:  # tiny inputs: transpose overhead isn't worth it
        return _tonemap(hdr, jnp)
    planar = jnp.moveaxis(flat, -1, 0)  # [3, N]
    r, g, b = planar[0], planar[1], planar[2]
    v0, v1, v2 = _mat3_planar(_ACES_IN, r, g, b)
    v0, v1, v2 = _rrt_odt_fit(v0), _rrt_odt_fit(v1), _rrt_odt_fit(v2)
    v0, v1, v2 = _mat3_planar(_ACES_OUT, v0, v1, v2)
    out = jnp.stack([v0, v1, v2], axis=-1).reshape(shape)
    return jnp.clip(out, 0.0, 1.0)


def _mat3_planar(m, r, g, b):
    return (
        r * m[0][0] + g * m[0][1] + b * m[0][2],
        r * m[1][0] + g * m[1][1] + b * m[1][2],
        r * m[2][0] + g * m[2][1] + b * m[2][2],
    )


def aces_tonemap_np(hdr):
    return _tonemap(np.asarray(hdr, np.float32), np)
