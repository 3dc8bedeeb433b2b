"""SVGF denoiser: temporal accumulation + a-trous wavelet filtering.

Differentiable JAX re-implementation of the reference's SVGF stack
(assets/shaders/svgf_temporal.hlsl, svgf_atrous.hlsl, svgf_common.hlsli;
host orchestration SVGFDenoiser.cpp:66-203):

  * temporal: per-pixel stability weight w = exp(-dz^2 / 2 sigma_z^2) *
    saturate(n . n_hist); EMA of radiance and the first two luminance moments;
    variance = max(<Y^2> - <Y>^2, eps).  History lookup is same-pixel (the
    reference skips SVGF while the camera moves, DeferredRenderer.cpp:595,
    so no motion-vector reprojection exists to mirror).
    NOTE deviation: the reference computes alpha' = lerp(1, alpha, w) whose
    w->0 limit *keeps* history, contradicting its own "1 -> reset" comment;
    we use alpha' = alpha * w (the sensible variant left commented in the
    shader) so unstable pixels reset to the current frame.
  * a-trous: 4 dilated 5x5 passes (step 1,2,4,8) with separable B3-spline
    weights [1/16, 1/4, 3/8, 1/4, 1/16] and SVGF edge-stops
    wz = exp(-|dz| / (phi_z * step)), wn = <n0, n>^128,
    wl = exp(-|dY| / (phi_c * sqrt(var_center))), clamp-to-edge taps.

Everything is pure elementwise/shift arithmetic -- XLA fuses each a-trous
iteration into one kernel; gradients flow through the full filter (the
denoiser is part of the differentiable pipeline, per the north star).

Image layout: [H, W, C].
"""

from __future__ import annotations

import jax.numpy as jnp

from nebulae_tpu.core import math as nmath

B3 = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


def _finite_depth(depth, far=1e8):
    return jnp.minimum(depth, far)


def svgf_temporal(
    radiance, depth, normal, hist_radiance, hist_depth, hist_normal, hist_moments, cfg, histlen=None
):
    """Temporal accumulation step.

    radiance [H,W,3], depth [H,W], normal [H,W,3]; hist_* same shapes,
    hist_moments [H,W,2]; histlen [H,W] frames of valid history.
    Returns (accum_radiance, moments, variance, new_histlen).
    """
    dz = _finite_depth(depth) - _finite_depth(hist_depth)
    # Relative depth tolerance: the reference's absolute sigma (0.002) only
    # works because it never runs under motion; reprojected lookups need a
    # scale-aware compare.
    sigma = jnp.maximum(cfg.svgf_depth_sigma, 0.02 * _finite_depth(depth))
    w_depth = jnp.exp(-(dz * dz) / (2.0 * sigma * sigma))
    w_normal = jnp.clip((normal * hist_normal).sum(-1), 0.0, 1.0)
    w = w_depth * w_normal
    alpha = cfg.svgf_temporal_alpha * w  # history weight, 0 when unstable

    accum = radiance + (hist_radiance - radiance) * alpha[..., None]
    y = nmath.luminance(radiance, jnp)
    y_acc = y + (hist_moments[..., 0] - y) * alpha
    y2_acc = y * y + (hist_moments[..., 1] - y * y) * alpha
    variance = jnp.maximum(y2_acc - y_acc * y_acc, cfg.svgf_variance_eps)
    if histlen is None:
        histlen = jnp.zeros(radiance.shape[:2], jnp.float32)
    new_histlen = jnp.where(w > 0.5, histlen + 1.0, 1.0)

    # Short-history fallback (SVGF paper section 4.2, absent in the reference
    # shaders): until ~4 frames of history the temporal variance estimate is
    # meaningless (== eps right after a reset, which disables the a-trous
    # luminance edge-stop entirely), so estimate variance *spatially* from a
    # depth/normal-bilateral 7x7 neighborhood of the current moments.
    # Separable bilateral (7h + 7v taps instead of 49): per-axis weight
    # products approximate the full 2-D bilateral, which is plenty for a
    # bootstrap variance estimate (it only gates the first ~4 frames).
    z0 = _finite_depth(depth)

    def blur_axis(m1, m2, axis):
        sum_m1 = jnp.zeros_like(m1)
        sum_m2 = jnp.zeros_like(m2)
        sum_w = jnp.zeros_like(m1)
        for o in range(-3, 4):
            dy, dx = (o, 0) if axis == 0 else (0, o)
            wz = jnp.exp(
                -jnp.abs(z0 - _shift2d(z0, dy, dx))
                / jnp.maximum(cfg.svgf_phi_depth * 3.0, 1e-6)
            )
            wn = jnp.clip((normal * _shift2d(normal, dy, dx)).sum(-1), 0.0, 1.0) ** cfg.svgf_phi_normal
            ww = wz * wn
            sum_m1 = sum_m1 + _shift2d(m1, dy, dx) * ww
            sum_m2 = sum_m2 + _shift2d(m2, dy, dx) * ww
            sum_w = sum_w + ww
        denom = jnp.maximum(sum_w, 1e-6)
        return sum_m1 / denom, sum_m2 / denom

    def with_spatial(variance):
        m1s, m2s = blur_axis(y, y * y, axis=1)
        m1s, m2s = blur_axis(m1s, m2s, axis=0)
        var_spatial = jnp.maximum(m2s - m1s * m1s, cfg.svgf_variance_eps) * 4.0
        return jnp.where(new_histlen < 4.0, jnp.maximum(variance, var_spatial), variance)

    # The 14-tap bilateral only matters while some pixel's history is short;
    # in steady state (static or well-reprojected camera) skip it entirely.
    import jax as _jax

    variance = _jax.lax.cond(
        jnp.any(new_histlen < 4.0), with_spatial, lambda v: v, variance
    )

    moments = jnp.stack([y_acc, y2_acc], axis=-1)
    return accum, moments, variance, new_histlen


def _shift2d(img, dy: int, dx: int, mode: str = "edge"):
    """Shift with clamp-to-edge (default) or zero padding."""
    h, w = img.shape[0], img.shape[1]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad, mode=mode) if mode == "edge" else jnp.pad(img, pad)
    return padded[max(-dy, 0) : max(-dy, 0) + h, max(-dx, 0) : max(-dx, 0) + w]


def _valid2d(shape, dy: int, dx: int):
    """Mask of taps that fall inside the image for shift (dy, dx)."""
    h, w = shape
    ones = jnp.ones((h, w), jnp.float32)
    return _shift2d(ones, dy, dx, mode="constant")


def svgf_atrous_step(radiance, variance, depth, normal, step: int, cfg):
    """One dilated 5x5 a-trous iteration. Returns filtered radiance.

    The edge-stop weights are detached: given weights, the filter is linear
    in radiance, so its VJP is just the transposed (mirrored) filter --
    cheap.  Differentiating *through* the weights would chain exp/pow
    gradients across 25 taps x 4 passes for no useful signal (the weights
    are denoising heuristics, not physical quantities).

    Border semantics: out-of-image taps get zero weight (the normalization
    absorbs them).  This deviates from the reference's clamp-to-edge taps
    (svgf_atrous.hlsl ClampScreenCoord) in a <= 2*step px band, and matches
    kernels/pallas_svgf.py exactly so both backends agree."""
    import jax

    lum0 = nmath.luminance(radiance, jnp)
    var_scale = jnp.maximum(cfg.svgf_phi_color * jnp.sqrt(jnp.maximum(variance, 1e-8)), 1e-6)
    z0 = _finite_depth(depth)
    sum_c = jnp.zeros_like(radiance)
    sum_w = jnp.zeros(radiance.shape[:2], radiance.dtype)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            k = B3[abs(dy)] * B3[abs(dx)]
            c = _shift2d(radiance, dy * step, dx * step)
            z = _shift2d(z0, dy * step, dx * step)
            n = _shift2d(normal, dy * step, dx * step)
            valid = _valid2d(radiance.shape[:2], dy * step, dx * step)
            lum = nmath.luminance(c, jnp)
            wz = jnp.exp(-jnp.abs(z0 - z) / (cfg.svgf_phi_depth * step))
            wn = jnp.clip((normal * n).sum(-1), 0.0, 1.0) ** cfg.svgf_phi_normal
            wl = jnp.exp(-jnp.abs(lum0 - lum) / var_scale)
            w = jax.lax.stop_gradient(k * wz * wn * wl * valid)
            sum_c = sum_c + c * w[..., None]
            sum_w = sum_w + w
    return sum_c / jnp.maximum(sum_w, 1e-4)[..., None]


def _use_pallas_svgf(cfg):
    import jax

    return getattr(cfg, "svgf_pallas", True) and jax.default_backend() == "tpu"


def svgf_atrous(radiance, variance, depth, normal, cfg):
    """Full a-trous cascade: passes with dilation 1, 2, 4, 8, ...

    Variance stays fixed across iterations (matches the reference host loop,
    SVGFDenoiser.cpp:153-196, which never updates the variance texture).
    On TPU each iteration runs as one fused Pallas stencil
    (kernels/pallas_svgf.py); elsewhere as the XLA shift/accumulate above
    (identical math and border semantics)."""
    if _use_pallas_svgf(cfg):
        from nebulae_tpu.kernels.pallas_svgf import atrous_step_pallas as step_fn

        def step_impl(out, s):
            return step_fn(out, variance, depth, normal, s, cfg)
    else:
        def step_impl(out, s):
            return svgf_atrous_step(out, variance, depth, normal, s, cfg)

    out = radiance
    for i in range(cfg.svgf_atrous_passes):
        out = step_impl(out, 1 << i)
    return out


def _bilinear_history(img, x, y):
    """Bilinear gather from an image-space history buffer.

    img [H, W, C] or [H, W]; x, y [H, W] float pixel coords. Returns sampled
    values + an in-bounds weight mask [H, W]."""
    h, w = img.shape[0], img.shape[1]
    # Half-pixel tolerance: border pixels reproject to exactly w-1 +/- fp.
    in_bounds = (x >= -0.5) & (x <= w - 0.5) & (y >= -0.5) & (y <= h - 0.5)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    if img.ndim == 2:
        imgc = img[..., None]
    else:
        imgc = img
    # Flat 1-D indices lower to a single-operand gather (cheaper on TPU than
    # the 2-operand [y, x] form).
    flat = imgc.reshape(h * w, imgc.shape[-1])
    shp = x0i.shape
    c00 = jnp.take(flat, (y0i * w + x0i).reshape(-1), axis=0).reshape(*shp, -1)
    c01 = jnp.take(flat, (y0i * w + x1i).reshape(-1), axis=0).reshape(*shp, -1)
    c10 = jnp.take(flat, (y1i * w + x0i).reshape(-1), axis=0).reshape(*shp, -1)
    c11 = jnp.take(flat, (y1i * w + x1i).reshape(-1), axis=0).reshape(*shp, -1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy
    if img.ndim == 2:
        out = out[..., 0]
    return out, in_bounds


def _bilinear_history_quad(stack, x, y):
    """Bilinear gather from a multi-channel history stack with ONE row gather.

    The 2x2 tap neighborhood is pre-packed per pixel via clamp-to-edge shifts
    (cheap dense copies), so the fetch is a single [H*W, 4C] row gather at
    (y0, x0) instead of four [H*W, C] gathers -- gather cost on TPU is per
    fetched row (measured 278 -> ~90 ms on the 1080p 10-channel reproject).
    stack [H, W, C]; x, y [H, W].  Returns ([H, W, C], in_bounds [H, W])."""
    h, w, c = stack.shape
    in_bounds = (x >= -0.5) & (x <= w - 0.5) & (y >= -0.5) & (y <= h - 0.5)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    # quad[y, x] = (p, p->right, p->down, p->down-right), edge-clamped: the
    # shifted copies replicate the border exactly like min(i+1, n-1) taps.
    quad = jnp.concatenate(
        [stack, _shift2d(stack, 0, -1), _shift2d(stack, -1, 0), _shift2d(stack, -1, -1)],
        axis=-1,
    ).reshape(h * w, 4 * c)
    # Row-width fast path: 2M-row gathers from tables with a narrow minor
    # dim get a channel-planar {0,1} layout from XLA, turning each row fetch
    # into C strided reads -- [N,40] f32 measured 99.5 ms vs [N,64] 29.9 on
    # v5e (the round-3 153 ms warp).  Padding the 40-channel quad to 64
    # flips the layout to row-major and the warp runs ~3.3x faster for the
    # cost of one dense copy.  The optimization_barrier keeps XLA's
    # simplifier from stripping the pad (it otherwise sees pad->gather->
    # slice and removes it, reverting the layout).  Exact: pad channels are
    # sliced off after the gather.
    import jax as _jax

    padded_c = -(-(4 * c) // 64) * 64
    if padded_c != 4 * c:
        quad = jnp.pad(quad, ((0, 0), (0, padded_c - 4 * c)))
        quad = _jax.lax.optimization_barrier(quad)
    rows = jnp.take(quad, (y0i * w + x0i).reshape(-1), axis=0)
    rows = rows[:, : 4 * c].reshape(h, w, 4, c)
    c00, c01, c10, c11 = rows[..., 0, :], rows[..., 1, :], rows[..., 2, :], rows[..., 3, :]
    out = (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy
    return out, in_bounds


def reproject_history(history: dict, position, prev_viewproj, width: int, height: int, prev_eye=None, current_depth=None):
    """Motion-vector temporal reprojection (beyond the reference, which
    disables SVGF while the camera moves, DeferredRenderer.cpp:595): project
    this frame's world positions through the *previous* frame's view-proj,
    sample every history buffer bilinearly there, and zero the stability
    weight off-screen.

    position [H, W, 3]; prev_viewproj [4, 4]. Returns (warped history dict,
    valid [H, W]).

    All history channels are stacked into one [H, W, 10] buffer before the
    bilinear fetch so the 4 corner taps are 4 gathers total instead of 4 per
    buffer: TPU gather cost is dominated by per-op overhead, not element
    count (measured ~5x on the 1080p reproject)."""
    p = jnp.concatenate([position, jnp.ones(position.shape[:-1] + (1,), position.dtype)], -1)
    clip = p @ prev_viewproj.T
    w_c = clip[..., 3]
    safe_w = jnp.where(jnp.abs(w_c) < 1e-8, 1.0, w_c)
    ndc = clip[..., :3] / safe_w[..., None]
    x = (ndc[..., 0] * 0.5 + 0.5) * width - 0.5
    y = (0.5 - ndc[..., 1] * 0.5) * height - 0.5
    in_front = w_c > 1e-8

    stack = jnp.concatenate(
        [
            history["radiance"],
            history["depth"][..., None],
            history["normal"],
            history["moments"],
            history["histlen"][..., None],
        ],
        axis=-1,
    )
    warped_stack, ib = _bilinear_history_quad(stack, x, y)
    rad = warped_stack[..., 0:3]
    dep = warped_stack[..., 3]
    nrm = warped_stack[..., 4:7]
    mom = warped_stack[..., 7:9]
    hl = warped_stack[..., 9]
    if prev_eye is not None and current_depth is not None:
        # History depth is distance from the *previous* eye; re-express it so
        # the temporal compare (current_depth - warped_depth) measures the
        # actual disocclusion error |expected_prev - sampled_prev|.
        expected_prev = jnp.linalg.norm(position - prev_eye, axis=-1)
        dep = dep - expected_prev + _finite_depth(current_depth)
    warped = {"radiance": rad, "depth": dep, "normal": nrm, "moments": mom, "histlen": hl}
    return warped, ib & in_front


def svgf_denoise(radiance, depth, normal, history: dict, cfg, hit=None):
    """Temporal + spatial; returns (denoised, new_history).

    history: dict(radiance, depth, normal, moments, histlen); init via
    `init_history`.  `hit` [H, W] bool: miss pixels bypass the filter --
    their zero normals would otherwise zero the center-tap edge-stop weight
    (0^phi_normal) and divide the output to black."""
    accum, moments, variance, histlen = svgf_temporal(
        radiance,
        depth,
        normal,
        history["radiance"],
        history["depth"],
        history["normal"],
        history["moments"],
        cfg,
        histlen=history["histlen"],
    )
    out = svgf_atrous(accum, variance, depth, normal, cfg)
    if hit is not None:
        out = jnp.where(hit[..., None], out, radiance)
    new_history = {
        "radiance": accum,
        # Cap at the far plane: storing inf (primary-miss depth) would turn
        # next frame's bilinear history taps into inf*0 = NaN.
        "depth": _finite_depth(depth),
        "normal": normal,
        "moments": moments,
        "histlen": histlen,
    }
    return out, new_history


def init_history(height: int, width: int):
    """Empty history: zero radiance/moments, infinite-depth mismatch forces a
    full reset on the first frame (ResetHistory analogue,
    SVGFDenoiser.cpp:49-64)."""
    return {
        "radiance": jnp.zeros((height, width, 3), jnp.float32),
        "depth": jnp.full((height, width), 1e9, jnp.float32),
        "normal": jnp.zeros((height, width, 3), jnp.float32),
        "moments": jnp.zeros((height, width, 2), jnp.float32),
        "histlen": jnp.zeros((height, width), jnp.float32),
        "prev_viewproj": jnp.eye(4, dtype=jnp.float32),
        "prev_eye": jnp.zeros(3, jnp.float32),
    }
