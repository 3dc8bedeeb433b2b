"""Frame presentation: the Swapchain analogue.

The reference presents through a Win32 flip-discard swapchain
(/root/reference/src/nri/Swapchain.{h,cpp}); headless TPU rendering instead
"presents" by encoding frames to disk (PNG sequence or a raw .npy stream).
Double-buffered host writes keep encode off the device critical path.
"""

from __future__ import annotations

import threading
from pathlib import Path

import numpy as np

from nebulae_tpu.core.texture import linear_to_srgb


def ldr_to_srgb_u8(ldr) -> np.ndarray:
    """Display-linear [0,1] -> sRGB-encoded uint8 (the sRGB backbuffer)."""
    img = linear_to_srgb(np.clip(np.asarray(ldr), 0.0, 1.0))
    return (img * 255.0 + 0.5).astype(np.uint8)


def colorize_map(values, vmin: float | None = None, vmax: float | None = None) -> np.ndarray:
    """Scalar [H, W] debug buffer -> heat-map RGB u8 (dark blue -> yellow).

    Presentation aid for the NRC debug resolve modes (bounce heat-maps etc.,
    mirroring the reference's debug views, NrcStructures.h:186-245).
    Negative sentinel values (-1 = "never") render black."""
    v = np.asarray(values, np.float32)
    neg = v < 0.0
    if vmin is None:
        vmin = float(v[~neg].min()) if (~neg).any() else 0.0
    if vmax is None:
        vmax = float(v.max())
    t = np.clip((v - vmin) / max(vmax - vmin, 1e-6), 0.0, 1.0)
    # simple 3-stop ramp: (0.05,0.03,0.3) -> (0.9,0.2,0.1) -> (1,0.95,0.2)
    lo = np.array([0.05, 0.03, 0.30], np.float32)
    mid = np.array([0.90, 0.20, 0.10], np.float32)
    hi = np.array([1.00, 0.95, 0.20], np.float32)
    a = np.clip(t * 2.0, 0.0, 1.0)[..., None]
    b = np.clip(t * 2.0 - 1.0, 0.0, 1.0)[..., None]
    rgb = lo * (1 - a) + mid * a
    rgb = rgb * (1 - b) + hi * b
    rgb[neg] = 0.0
    return (rgb * 255.0 + 0.5).astype(np.uint8)


class FrameWriter:
    """Async PNG/NPY frame sink ("present" without a window)."""

    def __init__(self, out_dir: str | Path, fmt: str = "png"):
        self.dir = Path(out_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.fmt = fmt
        self.frame = 0
        self._pending: threading.Thread | None = None

    def present(self, ldr) -> Path:
        """Queue the frame for encode; blocks only on the previous encode
        (2 frames in flight, like the reference's fence pacing)."""
        data = ldr_to_srgb_u8(ldr)
        path = self.dir / f"frame_{self.frame:05d}.{self.fmt}"
        if self._pending is not None:
            self._pending.join()

        def write():
            if self.fmt == "png":
                from PIL import Image

                Image.fromarray(data).save(path)
            else:
                np.save(path, data)

        self._pending = threading.Thread(target=write)
        self._pending.start()
        self.frame += 1
        return path

    def flush(self):
        if self._pending is not None:
            self._pending.join()
            self._pending = None
