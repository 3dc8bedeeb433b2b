"""Golden-data dump/compare utilities.

The reference's ad-hoc validation dumps CPU-side geometry binaries to compare
against the GPU-visible flattening (GIProcessedScene.cpp:95-123 behind #if 0,
writer util/File.h:11-33).  Here the same idea is a first-class test tool:
dump any array pytree to an .npz, reload, and allclose-compare -- used for
scene-flatten regression tests and cross-backend golden images.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def dump_golden(path: str | Path, tree: dict) -> None:
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}{k}/", v)
        else:
            flat[prefix.rstrip("/")] = np.asarray(node)

    walk("", tree)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


def load_golden(path: str | Path) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def compare_golden(path: str | Path, tree: dict, rtol=1e-5, atol=1e-6) -> list[str]:
    """Returns a list of mismatch descriptions (empty = all match)."""
    golden = load_golden(path)
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}{k}/", v)
        else:
            flat[prefix.rstrip("/")] = np.asarray(node)

    walk("", tree)
    problems = []
    for k, v in golden.items():
        if k not in flat:
            problems.append(f"missing key {k}")
        elif v.shape != flat[k].shape:
            problems.append(f"{k}: shape {flat[k].shape} != golden {v.shape}")
        elif not np.allclose(flat[k], v, rtol=rtol, atol=atol):
            err = np.abs(np.asarray(flat[k], np.float64) - v).max()
            problems.append(f"{k}: max abs err {err}")
    return problems
