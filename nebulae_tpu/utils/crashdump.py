"""Failure detection and crash dumps.

Parity with the reference's Nsight Aftermath crash tracker
(/root/reference/src/nri/nvidia/NsightAftermathCrashTracker.cpp:33-120: on
device removal it writes a GPU dump + shader debug info).  TPU analogue:
a process-level exception hook that snapshots the frame state (pytree of
arrays) and environment to a dump directory, plus `faulthandler` for hard
crashes, plus a heartbeat file other hosts can watch (the multi-host failure
detector the reference never needed).
"""

from __future__ import annotations

import faulthandler
import json
import os
import sys
import time
import traceback
from pathlib import Path

import numpy as np

_DUMP_DIR = Path(os.environ.get("NEBULAE_CRASH_DIR", "/tmp/nebulae_crash"))
_state_provider = None


def install(state_provider=None, dump_dir: str | Path | None = None) -> None:
    """Install the crash tracker.  `state_provider() -> dict` supplies the
    pytree to snapshot on failure (e.g. `lambda: renderer.state`)."""
    global _state_provider, _DUMP_DIR
    _state_provider = state_provider
    if dump_dir is not None:
        _DUMP_DIR = Path(dump_dir)
    _DUMP_DIR.mkdir(parents=True, exist_ok=True)
    faulthandler.enable(open(_DUMP_DIR / "faulthandler.log", "w"))
    sys.excepthook = _excepthook


def _excepthook(exc_type, exc, tb) -> None:
    try:
        write_dump(exc_type.__name__, "".join(traceback.format_exception(exc_type, exc, tb)))
    finally:
        sys.__excepthook__(exc_type, exc, tb)


def write_dump(reason: str, detail: str = "") -> str:
    """Write a crash dump: metadata JSON + (if available) the state pytree."""
    _DUMP_DIR.mkdir(parents=True, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    meta = {
        "reason": reason,
        "detail": detail,
        "time": stamp,
        "pid": os.getpid(),
        "argv": sys.argv,
        "env": {k: v for k, v in os.environ.items() if k.startswith(("JAX", "XLA", "NEBULAE"))},
    }
    path = _DUMP_DIR / f"crash_{stamp}.json"
    path.write_text(json.dumps(meta, indent=2))
    if _state_provider is not None:
        try:
            from nebulae_tpu.utils.golden import dump_golden

            state = _state_provider()
            dump_golden(_DUMP_DIR / f"state_{stamp}.npz", _to_numpy_tree(state))
        except Exception as e:  # state itself may be poisoned
            (_DUMP_DIR / f"state_{stamp}.failed").write_text(repr(e))
    return str(path)


def _to_numpy_tree(tree):
    if isinstance(tree, dict):
        return {str(k): _to_numpy_tree(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return {str(i): _to_numpy_tree(v) for i, v in enumerate(tree)}
    try:
        return np.asarray(tree)
    except Exception:
        return np.zeros(0)


class Heartbeat:
    """Multi-host liveness file: touch() every frame; other hosts treat a
    stale mtime as a failed peer (green-field vs the reference, which just
    dies on TDR)."""

    def __init__(self, path: str | Path, stale_after_s: float = 60.0):
        self.path = Path(path)
        self.stale_after_s = stale_after_s
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def touch(self):
        self.path.write_text(str(time.time()))

    def is_stale(self) -> bool:
        try:
            last = float(self.path.read_text())
        except (OSError, ValueError):
            return True
        return (time.time() - last) > self.stale_after_s
