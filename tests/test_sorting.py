"""Compacted-sort unsort strategies: every bucket (prefix row-scatter for
tiny live counts, full-width sort-carry otherwise, sorting._scatter_unsort)
must return identical hits/occlusion in ray order."""

import jax.numpy as jnp
import numpy as np
import pytest

from nebulae_tpu.config import RenderConfig
from nebulae_tpu.tracer.sorting import ray_sort_key, sorted_any, sorted_shadow_closest
from nebulae_tpu.tracer.trace import make_tracer

N = 32 * 1024


@pytest.fixture(scope="module")
def setup(cornell_scene):
    scene = {k: jnp.asarray(v) for k, v in cornell_scene.flat.device_arrays().items()}
    cfg = RenderConfig(tracer="bruteforce", fast_bounce_shading=True)
    closest_fn, any_fn = make_tracer(scene, None, cfg)

    rng = np.random.default_rng(7)
    lo = np.asarray(scene["aabb_min"])
    hi = np.asarray(scene["aabb_max"])
    o = rng.uniform(lo + 0.25 * (hi - lo), hi - 0.25 * (hi - lo), (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    l = rng.normal(size=(N, 3)).astype(np.float32) * 0.05 + np.array([0.3, 0.9, 0.3])
    l = (l / np.linalg.norm(l, axis=-1, keepdims=True)).astype(np.float32)
    return scene, closest_fn, any_fn, jnp.asarray(o), jnp.asarray(d), jnp.asarray(l)


# live counts selecting: the 1024 bucket (prefix row-scatter unsort), a
# mid bucket (sort-carry unsort), and the full-width path.
@pytest.mark.parametrize("n_live", [700, 3000, 30000])
def test_buckets_agree_with_uncompacted(setup, n_live):
    scene, closest_fn, any_fn, o, d, l = setup
    alive = jnp.roll(jnp.arange(N) < n_live, 123)
    key = ray_sort_key(
        o, d, scene["aabb_min"], scene["aabb_max"], alive,
        low_bits=alive.astype(jnp.int32) + 2 * alive.astype(jnp.int32),
    )

    occ_c, hit_c = sorted_shadow_closest(any_fn, closest_fn, o, l, d, key)
    occ_f, hit_f = sorted_shadow_closest(any_fn, closest_fn, o, l, d, key, compact=False)

    live = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(occ_c)[live], np.asarray(occ_f)[live])
    # The XLA bruteforce tracer vectorizes differently per batch width, so t
    # lands within a few ULP across bucket sizes (the Pallas kernels, with
    # fixed tile shapes, are bit-exact; tests/test_pallas_kernel.py).
    np.testing.assert_array_equal(
        np.asarray(hit_c["tri"])[live], np.asarray(hit_f["tri"])[live],
        err_msg="hit[tri] differs on live lanes (bucket vs full)",
    )
    for k in ("t", "u", "v"):
        np.testing.assert_allclose(
            np.asarray(hit_c[k])[live], np.asarray(hit_f[k])[live],
            rtol=1e-5, atol=1e-6,
            err_msg=f"hit[{k}] differs on live lanes (bucket vs full)",
        )
    # dead lanes hold the miss record in every strategy
    dead = ~live
    assert not np.asarray(occ_c)[dead].any()
    assert (np.asarray(hit_c["tri"])[dead] == -1).all()
    assert np.isinf(np.asarray(hit_c["t"])[dead]).all()


@pytest.mark.parametrize("n_live", [700, 3000, 30000])
def test_compact_post_buckets_agree(setup, n_live):
    """The compact-domain reconstruct channels (compact_post) must come back
    in ray order identically across every bucket/unsort strategy, and match
    a direct full-width computation from the uncompacted hit."""
    from nebulae_tpu.core.surface import _bary_packed, _take_rows
    from nebulae_tpu.core import math as nmath

    scene, closest_fn, any_fn, o, d, l = setup
    alive = jnp.roll(jnp.arange(N) < n_live, 123)
    key = ray_sort_key(
        o, d, scene["aabb_min"], scene["aabb_max"], alive,
        low_bits=alive.astype(jnp.int32) + 2 * alive.astype(jnp.int32),
    )

    def post(hit, os, bs):
        tid = jnp.clip(hit["tri"], 0, scene["tri_pos"].shape[0] - 1)
        row = _take_rows(scene["tri_fast"], tid, jnp)
        nrm = nmath.normalize(_bary_packed(row[..., 0:9], hit["u"], hit["v"], 3, jnp))
        return {
            "mat": jnp.where(hit["tri"] >= 0, row[..., 12], -1.0),
            "nx": nrm[..., 0], "ny": nrm[..., 1], "nz": nrm[..., 2],
        }

    fills = {"nz": 1.0}
    occ_c, hit_c = sorted_shadow_closest(
        any_fn, closest_fn, o, l, d, key, compact_post=post, post_fills=fills
    )
    occ_f, hit_f = sorted_shadow_closest(
        any_fn, closest_fn, o, l, d, key, compact_post=post, post_fills=fills,
        compact=False,
    )
    # Ground truth: uncompacted hit + the same reconstruction full-width.
    occ_r, hit_r = sorted_shadow_closest(any_fn, closest_fn, o, l, d, key, compact=False)
    truth = post(hit_r, o, d)

    live = np.asarray(alive)
    for hit in (hit_c, hit_f):
        np.testing.assert_array_equal(np.asarray(hit["found"])[live], np.asarray(hit_r["tri"])[live] >= 0)
        np.testing.assert_array_equal(
            np.asarray(hit["mat"])[live],
            np.round(np.asarray(truth["mat"]))[live].astype(np.int32),
        )
        for k in ("nx", "ny", "nz"):
            np.testing.assert_allclose(
                np.asarray(hit[k])[live], np.asarray(truth[k])[live],
                rtol=1e-5, atol=1e-6, err_msg=f"{k} differs (bucket vs truth)",
            )
        # dead lanes carry the fills / miss record
        dead = ~live
        assert (np.asarray(hit["mat"])[dead] == -1).all()
        assert np.isinf(np.asarray(hit["t"])[dead]).all()


@pytest.mark.parametrize("n_live", [700, 3000, 30000])
def test_segmented_matches_global(setup, n_live):
    """Segment-local sort/compact/unsort (sort_segments > 1, the shard-local
    layout) must return the same hits/occlusion as the global sort -- the
    XLA bruteforce tracer vectorizes per batch width, so t/u/v agree to a
    few ULP while ids/occlusion are exact."""
    scene, closest_fn, any_fn, o, d, l = setup
    alive = jnp.roll(jnp.arange(N) < n_live, 123)
    key = ray_sort_key(
        o, d, scene["aabb_min"], scene["aabb_max"], alive,
        low_bits=alive.astype(jnp.int32) + 2 * alive.astype(jnp.int32),
    )
    occ_g, hit_g = sorted_shadow_closest(any_fn, closest_fn, o, l, d, key)
    occ_s, hit_s = sorted_shadow_closest(
        any_fn, closest_fn, o, l, d, key, segments=8
    )
    live = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(occ_s)[live], np.asarray(occ_g)[live])
    np.testing.assert_array_equal(
        np.asarray(hit_s["tri"])[live], np.asarray(hit_g["tri"])[live]
    )
    for k in ("t", "u", "v"):
        np.testing.assert_allclose(
            np.asarray(hit_s[k])[live], np.asarray(hit_g[k])[live],
            rtol=1e-5, atol=1e-6,
        )
    dead = ~live
    assert (np.asarray(hit_s["tri"])[dead] == -1).all()
    assert np.isinf(np.asarray(hit_s["t"])[dead]).all()

    # sorted_any segmented too
    from nebulae_tpu.tracer.sorting import DEAD_ORIGIN, sorted_any as _sa

    o_sh = jnp.where(alive[:, None], o, DEAD_ORIGIN)
    key_a = ray_sort_key(o_sh, l, scene["aabb_min"], scene["aabb_max"], alive)
    a_g = _sa(any_fn, o_sh, l, key_a)
    a_s = _sa(any_fn, o_sh, l, key_a, segments=8)
    np.testing.assert_array_equal(np.asarray(a_s)[live], np.asarray(a_g)[live])


@pytest.mark.parametrize("n_live", [700, 30000])
def test_sorted_any_buckets(setup, n_live):
    scene, closest_fn, any_fn, o, d, l = setup
    alive = jnp.roll(jnp.arange(N) < n_live, 77)
    from nebulae_tpu.tracer.sorting import DEAD_ORIGIN

    o_sh = jnp.where(alive[:, None], o, DEAD_ORIGIN)
    key = ray_sort_key(o_sh, l, scene["aabb_min"], scene["aabb_max"], alive)
    occ = sorted_any(any_fn, o_sh, l, key)
    occ_ref = any_fn(o_sh, l)
    live = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(occ)[live], np.asarray(occ_ref)[live])
    assert not np.asarray(occ)[~live].any()
