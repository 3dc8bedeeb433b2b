"""Counter-free XorShift32 RNG with Jenkins-style hash seeding.

The reference path tracer seeds a per-pixel XorShift RNG with a Jenkins hash
of (pixel index, frame) (see /root/reference/assets/shaders/rand.hlsli:6-60,
used at pathtracer.hlsl:402).  We implement the same well-known public-domain
construction as pure uint32 arithmetic that is *bit-exact identical* between
numpy (CPU reference tracer) and jax.numpy (TPU pipeline), which is what makes
`allclose` comparisons of stochastic renders possible.

All state is explicit: functions take and return uint32 arrays, so the JAX
side stays functional and fori_loop/scan-friendly.
"""

from __future__ import annotations

import numpy as np

_U32 = 0xFFFFFFFF


def _is_np(x) -> bool:
    return isinstance(x, (np.ndarray, np.generic, int))


def jenkins_hash(x):
    """Jenkins one-at-a-time style avalanche hash on uint32."""
    xp = np if _is_np(x) else _jnp()
    x = xp.asarray(x, xp.uint32)
    x = (x + (x << xp.uint32(10))) & xp.uint32(_U32)
    x = x ^ (x >> xp.uint32(6))
    x = (x + (x << xp.uint32(3))) & xp.uint32(_U32)
    x = x ^ (x >> xp.uint32(11))
    x = (x + (x << xp.uint32(15))) & xp.uint32(_U32)
    return x


def _jnp():
    import jax.numpy as jnp

    return jnp


def init_rng(pixel_x, pixel_y, width, frame):
    """Seed state from pixel coordinate + frame index.

    seed = H(x + y * width ^ H(frame)); matches the reference's
    InitRNG(pixel, resolution, frame) structure.
    """
    xp = np if _is_np(pixel_x) else _jnp()
    px = xp.asarray(pixel_x, xp.uint32)
    py = xp.asarray(pixel_y, xp.uint32)
    w = xp.uint32(width)
    f = xp.asarray(frame, xp.uint32)
    seed = (px + py * w) ^ jenkins_hash(f)
    state = jenkins_hash(seed)
    # Zero state would be a fixed point of xorshift; nudge it.
    return xp.where(state == 0, xp.uint32(0x9E3779B9), state)


def xorshift32(state):
    """One XorShift32 step; returns new state (also the random output)."""
    xp = np if _is_np(state) else _jnp()
    state = xp.asarray(state, xp.uint32)
    state = state ^ ((state << xp.uint32(13)) & xp.uint32(_U32))
    state = state ^ (state >> xp.uint32(17))
    state = state ^ ((state << xp.uint32(5)) & xp.uint32(_U32))
    return state


def uint_to_unit_float(bits):
    """uint32 -> float32 in [0, 1): mantissa trick (asfloat(0x3f800000|x>>9)-1).

    Bit-exact across numpy/jnp because both perform the same f32 bitcast.
    """
    xp = np if _is_np(bits) else _jnp()
    mant = (xp.asarray(bits, xp.uint32) >> xp.uint32(9)) | xp.uint32(0x3F800000)
    if xp is np:
        return mant.view(np.float32) - np.float32(1.0)
    import jax

    return jax.lax.bitcast_convert_type(mant, xp.float32) - xp.float32(1.0)


def next_float(state):
    """Advance state, return (new_state, uniform float32 in [0,1))."""
    state = xorshift32(state)
    return state, uint_to_unit_float(state)


def next_float2(state):
    state, u1 = next_float(state)
    state, u2 = next_float(state)
    return state, u1, u2
