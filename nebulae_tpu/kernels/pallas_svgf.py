"""Pallas fused SVGF a-trous stencil.

One dilated 5x5 edge-stopped wavelet iteration (svgf_atrous.hlsl:36-85) as a
single Pallas kernel instead of 25 XLA pad+shift+accumulate stages.  XLA
materializes most of the shifted taps in HBM (25 taps x ~8 channels x the
frame), so at 1080p the cascade is bandwidth-bound on copies; the fused
stencil reads each input row block once into VMEM and does all tap work
in-register.

Layout & halo scheme
  * Channels are stacked into one [C, H_pad, W_pad] f32 array:
    fwd  C=9: r, g, b, lum, z, nx, ny, nz, vscale
    bwd  C=9: gr, gg, gb, lum, z, nx, ny, nz, vscale   (g = cotangent / sum_w)
  * Grid = row blocks of BH=8.  Each grid step receives FIVE views of the
    input (blocks i-2 .. i+2, edge-clamped index maps) concatenated to a
    40-row buffer, which covers the +/-16-row reach of the largest dilation
    (step 8).  BH=8 (not 16) keeps the view blocks + concat buffer + tap
    temporaries under the 16 MB VMEM budget at 1080p.  Columns carry a
    16-px zero pad on each side (plus lane-alignment padding), so every tap
    is a static in-VMEM slice.
  * Border semantics: out-of-image taps have ZERO weight.  The zero pad
    makes tap normals (0,0,0), so wn = clip(n.n', 0, 1)^phi_n = 0 kills the
    weight; the row-duplication near the first/last grid steps (clamped
    view index) is fixed by a kill mask on the intended global row.  This
    deviates from the reference's clamp-to-edge taps (svgf_atrous.hlsl
    ClampScreenCoord) only in a <=16 px border band and is what makes the
    transpose exact.

Differentiability: the edge-stop weights are detached (see
passes/svgf.py:svgf_atrous_step); given weights the filter is linear in
radiance, so the VJP is the transposed stencil with the SAME weight math
evaluated around the tap pixel:

  out(p)    = sum_o c(p+o) w(p, p+o) / W(p),  W(p) = max(sum_o w, 1e-4)
  grad_c(q) = sum_o [gbar/W](q+o) w(q+o, q)

where w(p, q) = k(o) wz(z_p, z_q) wn(n_p, n_q) wl(|lum_p - lum_q| / vs(p))
-- note vscale comes from the *center* pixel p, which in the backward
kernel is the tap position.  Gradients w.r.t. variance / depth / normal are
zero by the detachment contract.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 8  # output rows per grid step
HALO = 16  # max tap reach: 2 * max dilation step 8
HB = HALO // BH  # halo view blocks on each side of the center block
B3 = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


def _pow_static(x, n: int):
    """x**n for static integer n via binary exponentiation (phi_normal=128
    -> 7 squarings)."""
    if n <= 0:
        return jnp.ones_like(x)
    acc = None
    base = x
    while n:
        if n & 1:
            acc = base if acc is None else acc * base
        n >>= 1
        if n:
            base = base * base
    return acc


def _pad_stack(channels, h, w, w_pad):
    """[H, W] channel list -> [C, H_pad, W_pad] zero-padded stack."""
    h_pad = -(-h // BH) * BH
    x = jnp.stack(channels)  # [C, H, W]
    return jnp.pad(x, ((0, 0), (0, h_pad - h), (HALO, w_pad - w - HALO)))


def _atrous_kernel(
    *refs, step: int, w: int,
    phi_color: float, phi_normal: int, phi_depth: float, nb: int, mode: str,
):
    i = pl.program_id(0)
    view_refs, out_ref = refs[:-1], refs[-1]
    buf = jnp.concatenate([r[:] for r in view_refs], axis=1)
    # [C, (2*HB+1)*BH, W_pad]

    # Halo-row fixup: the clamped view index duplicates real rows near the
    # image top/bottom; taps into those rows must carry zero weight (fwd:
    # tap normals -> wn = 0) / zero cotangent (bwd: g channels).  Buffer row
    # r holds global row (i - HB)*BH + r when that is in [0, nb*BH), else a
    # clamped duplicate to kill.  Applied lazily per tap as a [BH, 1] row
    # mask to avoid copying the buffer.
    row = jax.lax.broadcasted_iota(jnp.int32, ((2 * HB + 1) * BH, 1), 0)
    grow = (i - HB) * BH + row
    keep = jnp.where((grow >= 0) & (grow < nb * BH), 1.0, 0.0)
    zero_ch = (5, 6, 7) if mode == "fwd" else (0, 1, 2)

    def tap(c, dy, dx):
        r = HB * BH + dy * step
        col = HALO + dx * step
        v = jax.lax.slice(buf, (c, r, col), (c + 1, r + BH, col + w))[0]
        if c in zero_ch:
            v = v * jax.lax.slice(keep, (r, 0), (r + BH, 1))
        return v

    c0r = tap(0, 0, 0)
    c0g = tap(1, 0, 0)
    c0b = tap(2, 0, 0)
    lum0 = tap(3, 0, 0)
    z0 = tap(4, 0, 0)
    n0x, n0y, n0z = tap(5, 0, 0), tap(6, 0, 0), tap(7, 0, 0)
    vs0 = tap(8, 0, 0)

    sum_r = jnp.zeros_like(c0r)
    sum_g = jnp.zeros_like(c0r)
    sum_b = jnp.zeros_like(c0r)
    sum_w = jnp.zeros_like(c0r)
    inv_phi_z = 1.0 / (phi_depth * step)
    inv_vs0 = 1.0 / jnp.maximum(vs0, 1e-9)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            k = B3[abs(dy)] * B3[abs(dx)]
            zt = tap(4, dy, dx)
            ndot = n0x * tap(5, dy, dx) + n0y * tap(6, dy, dx) + n0z * tap(7, dy, dx)
            wn = _pow_static(jnp.clip(ndot, 0.0, 1.0), phi_normal)
            wz = jnp.exp(-jnp.abs(z0 - zt) * inv_phi_z)
            dl = jnp.abs(lum0 - tap(3, dy, dx))
            if mode == "fwd":
                wl = jnp.exp(-dl * inv_vs0)
            else:
                # vscale of the *tap* pixel (the fwd center); tap pad rows
                # have vs=0 -> safe denom, and their wn/g are zero anyway.
                wl = jnp.exp(-dl / jnp.maximum(tap(8, dy, dx), 1e-9))
            wt = k * wz * wn * wl
            sum_r = sum_r + tap(0, dy, dx) * wt
            sum_g = sum_g + tap(1, dy, dx) * wt
            sum_b = sum_b + tap(2, dy, dx) * wt
            sum_w = sum_w + wt

    if mode == "fwd":
        inv = 1.0 / jnp.maximum(sum_w, 1e-4)
        out_ref[0] = sum_r * inv
        out_ref[1] = sum_g * inv
        out_ref[2] = sum_b * inv
        out_ref[3] = sum_w
    else:
        out_ref[0] = sum_r
        out_ref[1] = sum_g
        out_ref[2] = sum_b


def _run_stencil(stack, h, w, step, phi, mode, interpret):
    """stack [9, H_pad, W_pad] -> [C_out, H_pad, w] (C_out: fwd 4, bwd 3)."""
    c, h_pad, w_pad = stack.shape
    nb = h_pad // BH
    c_out = 4 if mode == "fwd" else 3
    phi_color, phi_normal, phi_depth = phi
    view = lambda f: pl.BlockSpec(
        (c, BH, w_pad), lambda i: (0, f(i), 0), memory_space=pltpu.VMEM
    )
    kern = partial(
        _atrous_kernel,
        step=step,
        w=w,
        phi_color=phi_color,
        phi_normal=int(phi_normal),
        phi_depth=phi_depth,
        nb=nb,
        mode=mode,
    )
    n_views = 2 * HB + 1
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            view(lambda i, d=d: jnp.clip(i + d, 0, nb - 1))
            for d in range(-HB, HB + 1)
        ],
        out_specs=pl.BlockSpec((c_out, BH, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_out, h_pad, w), jnp.float32),
        interpret=interpret,
    )(*([stack] * n_views))


def _w_pad(w):
    return HALO + w + HALO + ((-(w + 2 * HALO)) % 128)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _atrous_pallas(step, phi, interpret, radiance, variance, depth, normal):
    out, _ = _atrous_fwd(step, phi, interpret, radiance, variance, depth, normal)
    return out


def _prep(step, phi, radiance, variance, depth, normal):
    h, w = radiance.shape[:2]
    lum = (
        radiance[..., 0] * 0.2126 + radiance[..., 1] * 0.7152 + radiance[..., 2] * 0.0722
    )
    vscale = jnp.maximum(phi[0] * jnp.sqrt(jnp.maximum(variance, 1e-8)), 1e-6)
    z = jnp.minimum(depth, 1e8)
    chans = [
        radiance[..., 0], radiance[..., 1], radiance[..., 2], lum, z,
        normal[..., 0], normal[..., 1], normal[..., 2], vscale,
    ]
    return _pad_stack(chans, h, w, _w_pad(w)), (lum, z, vscale)


def _atrous_fwd(step, phi, interpret, radiance, variance, depth, normal):
    h, w = radiance.shape[:2]
    stack, (lum, z, vscale) = _prep(step, phi, radiance, variance, depth, normal)
    res = _run_stencil(stack, h, w, step, phi, "fwd", interpret)
    out = jnp.stack([res[0, :h], res[1, :h], res[2, :h]], axis=-1)
    sum_w = res[3, :h]
    return out, (lum, z, vscale, normal, sum_w)


def _atrous_bwd(step, phi, interpret, residuals, gbar):
    lum, z, vscale, normal, sum_w = residuals
    h, w = lum.shape
    g = gbar / jnp.maximum(sum_w, 1e-4)[..., None]
    chans = [
        g[..., 0], g[..., 1], g[..., 2], lum, z,
        normal[..., 0], normal[..., 1], normal[..., 2], vscale,
    ]
    stack = _pad_stack(chans, h, w, _w_pad(w))
    res = _run_stencil(stack, h, w, step, phi, "bwd", interpret)
    grad_rad = jnp.stack([res[0, :h], res[1, :h], res[2, :h]], axis=-1)
    return grad_rad, jnp.zeros_like(vscale), jnp.zeros_like(z), jnp.zeros_like(normal)


_atrous_pallas.defvjp(_atrous_fwd, _atrous_bwd)


def atrous_step_pallas(radiance, variance, depth, normal, step: int, cfg, interpret=False):
    """Drop-in for passes.svgf.svgf_atrous_step (valid-tap border semantics)."""
    phi = (float(cfg.svgf_phi_color), float(cfg.svgf_phi_normal), float(cfg.svgf_phi_depth))
    return _atrous_pallas(int(step), phi, bool(interpret), radiance, variance, depth, normal)
