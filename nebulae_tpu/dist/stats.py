"""Scaling falsifiability: collective volume + shard balance accounting.

The ≥80% linear host→pod scaling gate (BASELINE.md) cannot be measured on a
single chip, but it can be made *falsifiable*: count the bytes each compiled
step moves through collectives (the ICI/DCN traffic the partitioner
inserted) and assert the ray shards are balanced.  A step whose collective
volume is small relative to its on-chip work, with equal shards, is the
precondition for linear scaling; a regression here is visible long before a
pod exists.
"""

from __future__ import annotations

import re
from collections import defaultdict

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}

# Collective HLO opcodes inserted by the SPMD partitioner.
_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all", "collective-broadcast",
)

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """'f32[2073600,3]' -> byte count (0 for unparseable/opaque shapes)."""
    m = _SHAPE_RE.match(shape_str.strip())
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    if dt not in _DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def collective_stats(compiled) -> dict:
    """Parse a jax Compiled's optimized HLO for collective ops.

    Returns {op_kind: {"count": n, "bytes": output_bytes_per_step}} plus a
    "total_bytes" entry -- the per-step collective volume one executable
    moves over ICI/DCN.  Tuple-shaped collectives (grouped all-reduces) sum
    their element shapes.
    """
    txt = compiled.as_text()
    out: dict = defaultdict(lambda: {"count": 0, "bytes": 0})
    total = 0
    for line in txt.splitlines():
        s = line.lstrip()
        # "%all-reduce.5 = f32[64,64]{...} all-reduce(...)" or tuple shapes:
        # "... = (f32[64,64]{...}, f32[64]{...}) all-reduce(..."
        m = re.match(r"%?[\w.\-]+ = (\([^)]*\)|[^ ]+) ([\w\-]+)\(", s)
        if not m:
            continue
        shape_str, op = m.group(1), m.group(2)
        if op not in _COLLECTIVES:
            continue
        if shape_str.startswith("("):
            # tuple shape (grouped all-reduce): a ',' split would also split
            # dims, so re-find every dtype[dims] element instead
            nbytes = sum(
                _shape_bytes(f"{dt}[{dims}]")
                for dt, dims in _SHAPE_RE.findall(shape_str)
            )
        else:
            nbytes = _shape_bytes(shape_str)
        out[op]["count"] += 1
        out[op]["bytes"] += nbytes
        total += nbytes
    result = {k: dict(v) for k, v in out.items()}
    result["total_bytes"] = total
    return result


def shard_balance(arr) -> dict:
    """Per-device shard accounting for a sharded jax.Array: returns
    {"shards": n, "rows": [rows per shard], "balanced": bool}.  Balanced
    means every shard covers the same number of leading-axis rows -- the ray
    work (1 ray/pixel/bounce) is uniform in rows, so equal rows == equal
    per-device ray counts."""
    shards = getattr(arr, "addressable_shards", None)
    if not shards:
        return {"shards": 1, "rows": [int(arr.shape[0])], "balanced": True}
    rows = [int(s.data.shape[0]) for s in shards]
    return {"shards": len(rows), "rows": rows, "balanced": len(set(rows)) == 1}
