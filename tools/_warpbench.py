"""Microbench the SVGF history reprojection gather (the 153 ms orbit cost).

The round-3 trace showed ONE fused [2073600, 40] row gather of the
quad-packed history at ~2 GB/s effective.  This sweeps layout/width/dtype
variants to find the fast shape.  All timings are through jit with a chained
loop (K gathers per dispatch) to amortize dispatch overhead.
"""
from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W = 1080, 1920
N = H * W


def make_indices(key, motion_px=8.0):
    """Realistic warp indices: identity + smooth small offset, row-major-ish."""
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    # orbiting camera: offsets vary smoothly over the image
    dx = motion_px * np.sin(ys / 97.0)
    dy = motion_px * np.cos(xs / 211.0)
    x0 = np.clip(np.floor(xs + dx), 0, W - 1).astype(np.int32)
    y0 = np.clip(np.floor(ys + dy), 0, H - 1).astype(np.int32)
    return jnp.asarray((y0 * W + x0).reshape(-1))


def timed(fn, *args, iters=5, inner=4):
    f = jax.jit(fn, static_argnums=())
    out = f(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
        float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters / inner * 1e3


def chain_take(table, idx, inner=4):
    # chain K gathers, perturbing idx so XLA can't CSE them
    acc = jnp.zeros((N,), table.dtype)
    for k in range(inner):
        rows = jnp.take(table, (idx + k) % N, axis=0)
        acc = acc + rows[:, 0]
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--motion", type=float, default=8.0)
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)
    idx = make_indices(key, args.motion)
    idx_rand = jax.random.permutation(key, N).astype(jnp.int32)

    for c in (8, 16, 24, 40, 64):
        tbl = jnp.asarray(np.random.rand(N, c).astype(np.float32))
        ms = timed(partial(chain_take, inner=4), tbl, idx, inner=4)
        print(f"take [N,{c:3d}] f32 coherent-idx   {ms:8.1f} ms", flush=True)

    tbl40 = jnp.asarray(np.random.rand(N, 40).astype(np.float32))
    ms = timed(partial(chain_take, inner=4), tbl40, idx_rand, inner=4)
    print(f"take [N, 40] f32 random-idx     {ms:8.1f} ms", flush=True)

    tbl40b = tbl40.astype(jnp.bfloat16)
    ms = timed(partial(chain_take, inner=4), tbl40b, idx, inner=4)
    print(f"take [N, 40] bf16 coherent-idx  {ms:8.1f} ms", flush=True)

    # one-axis gather: rows of a [H, W*C] image picked per-scanline is not
    # the semantics we need; instead try gather on a [N/8, 8*C] coarse table
    # (2x2 superpixel pack = 4x fewer rows at 4x width)
    for blk, c in ((4, 40), (4, 24)):
        nb = N // blk
        tblb = jnp.asarray(np.random.rand(nb, blk * c).astype(np.float32))
        idxb = (idx // blk) % nb

        def chain_blk(table, i):
            acc = jnp.zeros((N,), table.dtype)
            for k in range(4):
                rows = jnp.take(table, (i + k) % nb, axis=0)
                acc = acc + jnp.repeat(rows[:, 0], blk)
            return acc

        ms = timed(chain_blk, tblb, idxb, inner=4)
        print(f"take [N/{blk}, {blk}x{c}] f32 block rows  {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
