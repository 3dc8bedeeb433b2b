"""Summarize a jax.profiler trace: top XLA ops by device time.

The tensorboard profile plugin's converter is broken in this image
(protobuf/pywrap version skew), so this parses the raw xplane protobuf via
tensorflow's bundled schema and aggregates the TPU "XLA Ops" line directly.
Fusion numbering is collapsed so repeated scan/loop bodies aggregate.

Usage:
    with jax.profiler.trace("/tmp/xprof_run"): ...   # capture
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/xprof_summary.py /tmp/xprof_run [top_n]

(The env var forces pure-python protobuf; the C++ descriptor pool rejects
tensorflow's older generated schema otherwise.)
"""

from __future__ import annotations

import glob
import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def summarize(trace_dir: str, top_n: int = 25) -> list[tuple[float, int, str]]:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        raise RuntimeError(f"no TPU plane in {paths[-1]} (planes: {[p.name for p in xs.planes]})")
    agg: dict[str, float] = defaultdict(float)
    cnt: dict[str, int] = defaultdict(int)
    for plane in planes:
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                base = re.sub(r"[.\d]+$", "", name)  # collapse %fusion.123 -> %fusion
                agg[base] += ev.duration_ps / 1e9
                cnt[base] += 1
    return [(ms, cnt[k], k) for k, ms in sorted(agg.items(), key=lambda kv: -kv[1])][:top_n]


def main() -> None:
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    for ms, n, name in summarize(trace_dir, top_n):
        print(f"{ms:9.2f} ms  x{n:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
