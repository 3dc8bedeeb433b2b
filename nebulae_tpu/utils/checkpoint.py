"""Checkpoint / resume via orbax.

The reference has no persistence at all (SURVEY.md section 5: the NRC cache
is reset via UI and nothing is ever saved); this is a new obligation.  We
checkpoint the full frame-state pytree -- NRC cache params + optimizer state,
SVGF history, frame counter -- plus optionally the trainable scene parameters,
so an online-training session (or an inverse-rendering fit) survives restarts.
"""

from __future__ import annotations

from pathlib import Path

import jax


def save_checkpoint(path: str | Path, state: dict, step: int | None = None) -> str:
    """Save a pytree checkpoint; returns the directory written."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if step is not None:
        path = path / f"step_{step:08d}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return str(path)


def load_checkpoint(path: str | Path, like: dict) -> dict:
    """Restore a pytree checkpoint with `like` as the structure/shape spec."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(lambda x: x, like)
    return ckptr.restore(Path(path).absolute(), target=target)


def latest_step_dir(root: str | Path) -> str | None:
    root = Path(root)
    if not root.exists():
        return None
    steps = sorted(p for p in root.iterdir() if p.name.startswith("step_"))
    return str(steps[-1]) if steps else None
