"""Cameras + primary ray generation.

``OrbitCamera`` mirrors the reference's InspectCamera (spherical orbit around
the origin with distance + (pitch, yaw) rotation,
/root/reference/src/core/InspectCamera.h:11-56).  ``Camera`` is the general
pinhole used by the renderer: the reference derives a 60-degree vertical FoV
perspective each frame (DeferredRenderer.cpp:148).

Ray generation is a pure function of (camera, pixel grid) and is written in
xp-generic style so the CPU oracle and the jitted pipeline share it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from nebulae_tpu.core import math as nmath


@dataclass
class Camera:
    eye: np.ndarray  # [3]
    target: np.ndarray  # [3]
    up: np.ndarray = field(default_factory=lambda: np.array([0.0, 1.0, 0.0], np.float32))
    fov_y_deg: float = 60.0
    near: float = 0.01
    far: float = 1000.0

    def basis(self):
        """Return (right, up, forward) world-space unit vectors."""
        eye = np.asarray(self.eye, np.float64)
        fwd = np.asarray(self.target, np.float64) - eye
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, np.asarray(self.up, np.float64))
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        return right.astype(np.float32), up.astype(np.float32), fwd.astype(np.float32)

    def view_matrix(self) -> np.ndarray:
        return nmath.look_at(np.asarray(self.eye), np.asarray(self.target), np.asarray(self.up))

    def proj_matrix(self, width: int, height: int) -> np.ndarray:
        return nmath.perspective(np.deg2rad(self.fov_y_deg), width / height, self.near, self.far)


@dataclass
class OrbitCamera:
    """Spherical orbit around the origin (InspectCamera.h semantics:
    default distance 3, rotation (pitch, yaw) in degrees with yaw=90 looking
    down -X ... we use the same parameterization)."""

    distance: float = 3.0
    pitch_deg: float = 0.0
    yaw_deg: float = 90.0
    target: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    fov_y_deg: float = 60.0

    def eye(self) -> np.ndarray:
        pitch = np.deg2rad(self.pitch_deg)
        yaw = np.deg2rad(self.yaw_deg)
        d = self.distance * np.cos(pitch)
        return (
            np.asarray(self.target)
            + np.array(
                [d * np.cos(yaw), self.distance * np.sin(pitch), d * np.sin(yaw)], np.float32
            )
        ).astype(np.float32)

    def camera(self) -> Camera:
        return Camera(eye=self.eye(), target=np.asarray(self.target, np.float32), fov_y_deg=self.fov_y_deg)

    def rotate(self, dyaw_deg: float, dpitch_deg: float):
        self.yaw_deg += dyaw_deg
        self.pitch_deg = float(np.clip(self.pitch_deg + dpitch_deg, -89.0, 89.0))

    def zoom(self, factor: float):
        self.distance = float(np.clip(self.distance * factor, 1e-3, 1e6))


def camera_rays(camera: Camera, width: int, height: int, xp=np, jitter=None):
    """Generate primary rays for every pixel.

    Returns (origins [H*W, 3], directions [H*W, 3] normalized).  ``jitter``
    optionally supplies per-pixel subpixel offsets [H*W, 2] in [0,1) (else
    pixel centers).  Pixel (0,0) is top-left; +x right, +y down.
    """
    right, up, fwd = camera.basis()
    tan_half = float(np.tan(np.deg2rad(camera.fov_y_deg) * 0.5))
    aspect = width / height
    ys, xs = xp.meshgrid(
        xp.arange(height, dtype=xp.float32), xp.arange(width, dtype=xp.float32), indexing="ij"
    )
    xs = xs.reshape(-1)
    ys = ys.reshape(-1)
    if jitter is None:
        jx = jy = 0.5
    else:
        jx, jy = jitter[..., 0], jitter[..., 1]
    # NDC in [-1, 1], y up
    u = ((xs + jx) / width * 2.0 - 1.0) * tan_half * aspect
    v = (1.0 - (ys + jy) / height * 2.0) * tan_half
    d = (
        u[:, None] * xp.asarray(right)[None, :]
        + v[:, None] * xp.asarray(up)[None, :]
        + xp.asarray(fwd)[None, :]
    )
    d = nmath.normalize(d)
    o = xp.broadcast_to(xp.asarray(camera.eye, xp.float32), d.shape)
    return o, d
