"""Gather-based texture sampling (bilinear, wrap/clamp) + sRGB conversion.

TPU has no texture units; sampling is 4 gathers + a lerp on the VPU.  The
reference samples sRGB8 textures through hardware sRGB->linear conversion and
bilinear filtering (deferred_gbuffers.hlsl / pathtracer.hlsl material fetch);
we reproduce both in float math.  Works on the padded texture stack produced
by scene.flatten_scene: textures [K, TH, TW, 4] u8 with per-texture (h, w).
"""

from __future__ import annotations

import numpy as np


def _xp(a):
    if isinstance(a, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def srgb_to_linear(c):
    """Exact piecewise sRGB EOTF on [0,1] values."""
    xp = _xp(c)
    lo = c / 12.92
    hi = ((c + 0.055) / 1.055) ** 2.4
    return xp.where(c <= 0.04045, lo, hi)


def linear_to_srgb(c):
    xp = _xp(c)
    c = xp.clip(c, 0.0, 1.0)
    lo = c * 12.92
    hi = 1.055 * xp.maximum(c, 1e-8) ** (1.0 / 2.4) - 0.055
    return xp.where(c <= 0.0031308, lo, hi)


def sample_bilinear_quad(quad_tex, tex_hw, tex_id, uv, xp=None, row_off=None):
    """Bilinear sample from a quad-packed texture stack with ONE row gather.

    quad_tex: either [K, TH, TW, 4C] u8 (padded slots) or [R, 4C] u8 flat
    rows with `row_off` [K] i32 per-slot starting rows (tightly packed -- the
    mip-chain layout, core.scene.device_arrays); each texel row holds its 2x2
    REPEAT-wrap neighborhood (core.scene.quad_pack_atlas).  Identical results
    to `sample_bilinear` on the unpacked stack, but a single gather instead
    of four (gather cost is per row).  Returns [..., C] f32."""
    xp = xp or _xp(uv)
    flat_form = quad_tex.ndim == 2
    n_slots = int(row_off.shape[0]) if flat_form else int(quad_tex.shape[0])
    tid = xp.clip(tex_id, 0, max(n_slots - 1, 0))
    hw = tex_hw[tid]
    h = hw[..., 0].astype(xp.float32)
    w = hw[..., 1].astype(xp.float32)
    u = uv[..., 0] - xp.floor(uv[..., 0])
    v = uv[..., 1] - xp.floor(uv[..., 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0f = xp.floor(x)
    y0f = xp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]

    def wrap(i, n):
        return xp.where(i < 0, i + n, xp.where(i >= n, i - n, i))

    x0 = wrap(x0f.astype(xp.int32), hw[..., 1])
    y0 = wrap(y0f.astype(xp.int32), hw[..., 0])

    shp = y0.shape
    if flat_form:
        c4 = int(quad_tex.shape[-1])
        flat = quad_tex
        idx = row_off[tid] + y0 * hw[..., 1] + x0
    else:
        k, th, tw, c4 = (int(s) for s in quad_tex.shape)
        flat = quad_tex.reshape(k * th * tw, c4)
        idx = tid * (th * tw) + y0 * tw + x0
    rows = xp.take(flat, idx.reshape(-1), axis=0).reshape(*shp, c4).astype(xp.float32) / 255.0
    c = c4 // 4
    c00, c01, c10, c11 = rows[..., 0:c], rows[..., c : 2 * c], rows[..., 2 * c : 3 * c], rows[..., 3 * c :]
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_bilinear(textures, tex_hw, tex_id, uv, xp=None):
    """Bilinear sample with REPEAT wrap.

    textures: [K, TH, TW, 4] u8; tex_hw: [K, 2] i32; tex_id: [...] i32
    (entries may be -1: result is garbage there, callers mask by flag);
    uv: [..., 2] f32.  Returns [..., 4] f32 in [0, 1].
    """
    xp = xp or _xp(uv)
    tid = xp.clip(tex_id, 0, max(int(textures.shape[0]) - 1, 0))
    hw = tex_hw[tid]  # [..., 2]
    h = hw[..., 0].astype(xp.float32)
    w = hw[..., 1].astype(xp.float32)
    # REPEAT wrap to [0, 1)
    u = uv[..., 0] - xp.floor(uv[..., 0])
    v = uv[..., 1] - xp.floor(uv[..., 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0f = xp.floor(x)
    y0f = xp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    hi = hw[..., 0] - 1
    wi = hw[..., 1] - 1

    def wrap(i, n):  # integer repeat wrap
        return xp.where(i < 0, i + n, xp.where(i >= n, i - n, i))

    x0 = wrap(x0f.astype(xp.int32), wi + 1)
    y0 = wrap(y0f.astype(xp.int32), hi + 1)
    x1 = wrap(x0 + 1, wi + 1)
    y1 = wrap(y0 + 1, hi + 1)

    # Flat 1-D indices into [K*TH*TW, 4]: a single-operand gather lowers ~3x
    # faster than the [tid, y, x] multi-operand form (measured 766 -> 252 ms
    # for a 1080p 4-map bilinear fetch on v5e; stacking taps or maps into
    # fewer, larger gathers is *slower* -- 388/476 ms).
    k, th, tw = int(textures.shape[0]), int(textures.shape[1]), int(textures.shape[2])
    flat = textures.reshape(k * th * tw, textures.shape[-1])
    base = tid * (th * tw)

    def fetch(yy, xx):
        shp = yy.shape
        rows = xp.take(flat, (base + yy * tw + xx).reshape(-1), axis=0)
        return rows.reshape(*shp, -1).astype(xp.float32) / 255.0

    c00 = fetch(y0, x0)
    c01 = fetch(y0, x1)
    c10 = fetch(y1, x0)
    c11 = fetch(y1, x1)
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy
