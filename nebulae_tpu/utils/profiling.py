"""Tracing / profiling utilities.

Parity with the reference's WinPixEventRuntime markers (`NEB_PIX_SCOPED_EVENT`
RAII wrapper, /root/reference/src/nri/PIXRuntime.h:85-116, instrumented in
every pass) and the once-per-second frametime log (Nebulae.cpp:82-90):

  * `pass_annotation(name)` -- jax.profiler.TraceAnnotation, visible in xprof
    traces exactly where PIX markers would appear in a GPU capture;
  * `FrameTimer` -- frame pacing stats with a 1 Hz console report;
  * `profile_trace(dir)` -- whole-program xprof capture contextmanager.
"""

from __future__ import annotations

import contextlib
import time

import jax

from nebulae_tpu.utils.logging import log_info


def pass_annotation(name: str):
    """Scoped trace annotation around a render pass (PIX event analogue)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/nebulae_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class FrameTimer:
    """Frametime/fps accounting with a once-per-second log line
    (Nebulae.cpp:82-90 behaviour)."""

    def __init__(self):
        self.last = time.perf_counter()
        self.acc = 0.0
        self.frames = 0
        self.fps = 0.0
        self.frametime_ms = 0.0

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self.last
        self.last = now
        self.acc += dt
        self.frames += 1
        if self.acc >= 1.0:
            self.fps = self.frames / self.acc
            self.frametime_ms = 1000.0 * self.acc / self.frames
            log_info(f"frametime {self.frametime_ms:.2f} ms ({self.fps:.1f} fps)")
            self.acc = 0.0
            self.frames = 0
        return dt


class RaysPerSecond:
    """Rolling rays/s counter for benchmark-style reporting."""

    def __init__(self):
        self.total_rays = 0
        self.total_time = 0.0

    def add(self, rays: int, seconds: float):
        self.total_rays += rays
        self.total_time += seconds

    @property
    def mrays_s(self) -> float:
        return self.total_rays / max(self.total_time, 1e-9) / 1e6
