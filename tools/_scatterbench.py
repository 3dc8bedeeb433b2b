"""Microbench: full-width row gather vs prefix gather + row scatter.

The per-bounce surface reconstruct currently runs FULL WIDTH in pixel order
(one [N] 13-ch row gather + 4 mat fetches).  Candidate: reconstruct in the
sorted live prefix (gathers scale with live count) and scatter the surf rows
back to pixel order.  This measures whether TPU row-scatter throughput makes
that a win.  K reps chained inside one jit; report per-rep ms.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = 2_073_600  # 1080p lanes
T = 139_000    # triangles
K = 8

key = jax.random.PRNGKey(0)
rows13 = jax.random.normal(key, (T, 13), jnp.float32)
tid_full = jax.random.randint(key, (N,), 0, T, jnp.int32)
perm = jax.random.permutation(key, N).astype(jnp.int32)


def time_fn(fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    out = f(*args)
    s = float(jax.tree.leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / K * 1e3
    return dt, s


def full_gather(rows, tid):
    acc = jnp.zeros((N, 13), jnp.float32)
    for i in range(K):
        acc = acc + jnp.take(rows, (tid + i) % T, axis=0)
    return acc


print("full-width 13ch gather      %8.2f ms" % time_fn(full_gather, rows13, tid_full)[0])

for frac in (4, 16, 64):
    nb = N // frac

    def prefix_gather_scatter(rows, tid, perm):
        acc = jnp.zeros((N, 17), jnp.float32)
        for i in range(K):
            r = jnp.take(rows, (tid[:nb] + i) % T, axis=0)  # [nb,13]
            surf = jnp.concatenate([r, r[:, :4] * 2.0], axis=-1)  # [nb,17]
            acc = acc + jnp.zeros((N, 17), jnp.float32).at[perm[:nb]].set(
                surf, mode="drop", unique_indices=True
            )
        return acc

    dt, _ = time_fn(prefix_gather_scatter, rows13, tid_full, perm)
    print("prefix 1/%-3d gather+17ch scatter %8.2f ms" % (frac, dt))

    def prefix_scatter_only(perm):
        acc = jnp.zeros((N, 17), jnp.float32)
        surf0 = jnp.ones((nb, 17), jnp.float32)
        for i in range(K):
            acc = acc + jnp.zeros((N, 17), jnp.float32).at[perm[:nb]].set(
                surf0 + i, mode="drop", unique_indices=True
            )
        return acc

    dt, _ = time_fn(prefix_scatter_only, perm)
    print("prefix 1/%-3d 17ch scatter only   %8.2f ms" % (frac, dt))
