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


class PreviewServer:
    """Live preview over localhost HTTP: the last ImGui-parity gap.

    The reference is a windowed app -- you *watch* the image while steering
    it with the panels (/root/reference/src/nri/imgui/UiContext.h:22-62).
    Headless parity: `PreviewServer` serves the latest presented frame at
    http://127.0.0.1:<port>/ (auto-refreshing page; /frame.png is the raw
    image), and `--control-file` is the knob half of the panel.  The server
    runs on a daemon thread; `update()` just swaps a PNG byte buffer, so
    the render loop never blocks on a viewer.
    """

    def __init__(self, port: int = 8642, host: str = "127.0.0.1"):
        import http.server

        self._lock = threading.Lock()
        self._u8: np.ndarray | None = None
        self._png: bytes | None = None
        self._frame = 0
        self._encoded_frame = -1
        server_self = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path.startswith("/frame.png"):
                    data = server_self._encode_latest()
                    if data is None:
                        self.send_response(404)
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Cache-Control", "no-store")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                elif self.path == "/" or self.path.startswith("/index"):
                    body = (
                        "<!doctype html><title>nebulae preview</title>"
                        "<body style='margin:0;background:#111'>"
                        "<img id=f style='width:100vw;image-rendering:pixelated'>"
                        "<script>const i=document.getElementById('f');"
                        "setInterval(()=>{i.src='/frame.png?t='+Date.now();},250);"
                        "</script></body>"
                    ).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(404)
                    self.end_headers()

        self._httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def update(self, ldr_or_u8) -> None:
        """Swap in a new frame (display-linear [0,1] float or sRGB u8).

        Only the u8 buffer is stored here; PNG encoding happens lazily in
        the HTTP handler thread on request (_encode_latest), so the render
        loop pays nothing when no viewer is connected."""
        arr = np.asarray(ldr_or_u8)
        data = arr if arr.dtype == np.uint8 else ldr_to_srgb_u8(arr)
        with self._lock:
            self._u8 = data
            self._frame += 1

    def _encode_latest(self) -> bytes | None:
        """Encode the most recent frame to PNG (handler thread; cached per
        frame so concurrent viewers share one encode)."""
        import io

        from PIL import Image

        with self._lock:
            if self._u8 is None:
                return self._png
            if self._encoded_frame == self._frame and self._png is not None:
                return self._png
            data, frame = self._u8, self._frame
        buf = io.BytesIO()
        Image.fromarray(data).save(buf, format="PNG")
        png = buf.getvalue()
        with self._lock:
            # A newer frame may have landed mid-encode; cache what we have
            # (the next request re-encodes if stale).
            self._png = png
            self._encoded_frame = frame
        return png

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
