"""BVH build validation + JAX tracer vs CPU brute-force parity."""

import numpy as np
import pytest


def _random_rays(n, lo, hi, seed=0):
    rng = np.random.default_rng(seed)
    center = (lo + hi) * 0.5
    extent = float(np.max(hi - lo))
    o = center + rng.normal(size=(n, 3)) * extent
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def test_bvh_build_valid(cornell_scene):
    from nebulae_tpu.bvh.builder import build_bvh, validate_bvh

    bvh = build_bvh(cornell_scene.flat.tri_pos)
    validate_bvh(bvh, cornell_scene.flat.tri_pos)


def test_bvh_build_valid_helmet(helmet_scene):
    from nebulae_tpu.bvh.builder import build_bvh, validate_bvh

    bvh = build_bvh(helmet_scene.flat.tri_pos)
    validate_bvh(bvh, helmet_scene.flat.tri_pos)
    # SAH tree should be reasonably deep/balanced: >> leaves of size<=4
    assert bvh.num_nodes > helmet_scene.flat.num_triangles / 4


def test_jax_bruteforce_matches_cpu(cornell_scene):
    import jax.numpy as jnp

    from nebulae_tpu.ref.tracer import intersect_closest_np
    from nebulae_tpu.tracer.trace import bruteforce_closest_hit

    tri = cornell_scene.flat.tri_pos
    o, d = _random_rays(512, cornell_scene.flat.aabb_min, cornell_scene.flat.aabb_max)
    ref = intersect_closest_np(o, d, tri)
    out = bruteforce_closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tri))
    np.testing.assert_array_equal(ref["tri"], np.asarray(out["tri"]))
    m = ref["tri"] >= 0
    np.testing.assert_allclose(ref["t"][m], np.asarray(out["t"])[m], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("scene_fixture", ["cornell_scene", "helmet_scene"])
def test_bvh_traversal_matches_bruteforce(scene_fixture, request):
    import jax.numpy as jnp

    from nebulae_tpu.bvh.builder import build_bvh
    from nebulae_tpu.ref.tracer import intersect_closest_np
    from nebulae_tpu.tracer.trace import bvh_closest_hit

    scene = request.getfixturevalue(scene_fixture)
    tri = scene.flat.tri_pos
    bvh = build_bvh(tri).device_arrays()
    o, d = _random_rays(1024, scene.flat.aabb_min, scene.flat.aabb_max, seed=7)
    ref = intersect_closest_np(o, d, tri)
    out = bvh_closest_hit(
        jnp.asarray(o), jnp.asarray(d), {k: jnp.asarray(v) for k, v in bvh.items()}, jnp.asarray(tri)
    )
    hit_ref = ref["tri"] >= 0
    hit_bvh = np.asarray(out["tri"]) >= 0
    np.testing.assert_array_equal(hit_ref, hit_bvh)
    # t must match; tri ids can differ on shared edges, so compare distances
    np.testing.assert_allclose(
        ref["t"][hit_ref], np.asarray(out["t"])[hit_ref], rtol=1e-4, atol=1e-5
    )
    same_tri = ref["tri"][hit_ref] == np.asarray(out["tri"])[hit_ref]
    assert same_tri.mean() > 0.99


def test_bvh_any_hit_matches(cornell_scene):
    import jax.numpy as jnp

    from nebulae_tpu.bvh.builder import build_bvh
    from nebulae_tpu.ref.tracer import intersect_any_np
    from nebulae_tpu.tracer.trace import bvh_any_hit

    tri = cornell_scene.flat.tri_pos
    bvh = {k: jnp.asarray(v) for k, v in build_bvh(tri).device_arrays().items()}
    o, d = _random_rays(1024, cornell_scene.flat.aabb_min, cornell_scene.flat.aabb_max, seed=3)
    ref = intersect_any_np(o, d, tri)
    out = np.asarray(bvh_any_hit(jnp.asarray(o), jnp.asarray(d), bvh, jnp.asarray(tri)))
    np.testing.assert_array_equal(ref, out)


def test_bvh_any_hit_tmax(cornell_scene):
    """Occlusion must respect t_max (light-distance clamp for NEE)."""
    import jax.numpy as jnp

    from nebulae_tpu.bvh.builder import build_bvh
    from nebulae_tpu.tracer.trace import bvh_any_hit

    tri = cornell_scene.flat.tri_pos
    bvh = {k: jnp.asarray(v) for k, v in build_bvh(tri).device_arrays().items()}
    center = (cornell_scene.flat.aabb_min + cornell_scene.flat.aabb_max) * 0.5
    o = np.tile(center.astype(np.float32), (4, 1))
    d = np.array([[0, 1.0, 0], [0, -1.0, 0], [1.0, 0, 0], [-1.0, 0, 0]], np.float32)
    far = bvh_any_hit(jnp.asarray(o), jnp.asarray(d), bvh, jnp.asarray(tri), t_max=1e6)
    near = bvh_any_hit(jnp.asarray(o), jnp.asarray(d), bvh, jnp.asarray(tri), t_max=1e-5)
    assert np.asarray(far).any()
    assert not np.asarray(near).any()
