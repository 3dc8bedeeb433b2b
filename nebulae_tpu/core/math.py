"""Math primitives shared by the CPU reference and the TPU pipeline.

Functions here are written against the ``numpy``-compatible subset of
``jax.numpy`` so the same code runs under both backends: every function takes
an explicit module argument ``xp`` (numpy or jax.numpy) or operates purely on
arrays via operators.

Conventions (documented once, used everywhere):
  * Right-handed, Y-up world space (glTF 2.0 convention).
  * Vectors are row vectors; matrices act as ``v @ M`` is NOT used -- we use
    mathematical column convention ``(M @ v)`` with matrices stored row-major
    as numpy arrays, i.e. ``world = (M[:3, :3] @ p) + M[:3, 3]``.
  * Images are ``[H, W, C]`` float32, linear radiometric values until the
    tonemap pass.

Parity notes: the reference stores row-major matrices and multiplies
``mul(v, M)`` (see /root/reference/src/core/Math.h:24-32); we adopt the
standard math convention instead and transpose at the glTF import boundary.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Vector helpers (xp-generic: work with numpy or jax.numpy arrays)
# ---------------------------------------------------------------------------


def dot(a, b, axis=-1, keepdims=True):
    return (a * b).sum(axis=axis, keepdims=keepdims)


def normalize(v, eps: float = 1e-12):
    n = (v * v).sum(axis=-1, keepdims=True)
    return v * (n + eps) ** -0.5


def length(v, axis=-1, keepdims=True):
    return ((v * v).sum(axis=axis, keepdims=keepdims)) ** 0.5


def cross(a, b):
    # Generic cross product: builds from components so it works for jnp & np.
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    if hasattr(a, "at") or not isinstance(a, np.ndarray):  # jax array
        import jax.numpy as jnp

        return jnp.stack([ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1)
    return np.stack([ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1)


def reflect(v, n):
    """Reflect direction v about normal n (v points away from surface)."""
    return 2.0 * dot(v, n) * n - v


# ---------------------------------------------------------------------------
# Orthonormal basis (branchless, Duff et al. / Pixar)
# ---------------------------------------------------------------------------


def build_orthonormal_basis(n, xp=np):
    """Return tangent, bitangent for unit normal n -- branchless ONB.

    Mirrors the role of ``GetPerpendicularVector`` in the reference's
    sun-disk sampling helper (assets/shaders/sun_disk_sampling.hlsli) but uses
    the numerically-stable Pixar ONB which is sign-bit branchless and thus
    vectorizes cleanly on the VPU.
    """
    nz = n[..., 2]
    sign = xp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = n[..., 0] * n[..., 1] * a
    t = xp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    bt = xp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


# ---------------------------------------------------------------------------
# Octahedral normal encoding (matches assets/shaders/octahedron_encoding.hlsli
# behaviourally: unit vector <-> 2 floats in [-1, 1])
# ---------------------------------------------------------------------------


def oct_encode(n, xp=np):
    """Unit vector -> oct [-1,1]^2. Zero vectors map to (0,0), not NaN
    (dead/masked lanes feed zero normals through here)."""
    denom = xp.abs(n[..., 0]) + xp.abs(n[..., 1]) + xp.abs(n[..., 2])
    p = n[..., :2] / xp.maximum(denom[..., None], 1e-12)
    px, py = p[..., 0], p[..., 1]
    wrap_x = (1.0 - xp.abs(py)) * xp.where(px >= 0.0, 1.0, -1.0)
    wrap_y = (1.0 - xp.abs(px)) * xp.where(py >= 0.0, 1.0, -1.0)
    down = n[..., 2] < 0.0
    ex = xp.where(down, wrap_x, px)
    ey = xp.where(down, wrap_y, py)
    return xp.stack([ex, ey], axis=-1)


def oct_decode(e, xp=np):
    """Oct [-1,1]^2 -> unit vector."""
    ex, ey = e[..., 0], e[..., 1]
    z = 1.0 - xp.abs(ex) - xp.abs(ey)
    t = xp.maximum(-z, 0.0)
    x = ex + xp.where(ex >= 0.0, -t, t)
    y = ey + xp.where(ey >= 0.0, -t, t)
    v = xp.stack([x, y, z], axis=-1)
    return normalize(v)


# ---------------------------------------------------------------------------
# AABB
# ---------------------------------------------------------------------------


def aabb_union(lo_a, hi_a, lo_b, hi_b, xp=np):
    return xp.minimum(lo_a, lo_b), xp.maximum(hi_a, hi_b)


def transform_point(mat4: np.ndarray, p):
    """Apply a 4x4 (math-convention) transform to points [..., 3]."""
    return p @ mat4[:3, :3].T + mat4[:3, 3]


def transform_dir(mat4: np.ndarray, d):
    return d @ mat4[:3, :3].T


def normal_matrix(mat4: np.ndarray) -> np.ndarray:
    """Inverse-transpose upper 3x3 for transforming normals."""
    return np.linalg.inv(mat4[:3, :3]).T


# ---------------------------------------------------------------------------
# Matrices (host-side, numpy): camera + projection
# ---------------------------------------------------------------------------


def look_at(eye: np.ndarray, target: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Right-handed view matrix (world -> camera), math convention."""
    eye = np.asarray(eye, np.float64)
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    m = np.eye(4)
    m[0, :3], m[1, :3], m[2, :3] = r, u, -f
    m[:3, 3] = -m[:3, :3] @ eye
    return m.astype(np.float32)


def perspective(fov_y_rad: float, aspect: float, near: float, far: float) -> np.ndarray:
    """Right-handed perspective projection (reference uses 60 deg vertical fov,
    /root/reference/src/DeferredRenderer.cpp:148)."""
    f = 1.0 / np.tan(fov_y_rad * 0.5)
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = far / (near - far)
    m[2, 3] = near * far / (near - far)
    m[3, 2] = -1.0
    return m


def luminance(rgb, xp=np):
    """Rec.709 luma -- used by SVGF moments & tonemap alpha."""
    return rgb[..., 0] * 0.2126 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722
