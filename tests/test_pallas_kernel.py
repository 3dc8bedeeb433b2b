"""Pallas packet-traversal kernel parity (interpret mode, CPU).

Covers the lane-packed encode (axis/lower bits), ordered near-first
traversal, per-ray t_max caps, the any-hit early exit, and VMEM chunking --
all against the CPU brute-force oracle.
"""

import numpy as np
import pytest


def _soup(n_tris=1500, seed=11):
    """Random triangle soup in [0,1]^3 with bounded triangle size."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.0, 1.0, size=(n_tris, 1, 3))
    off = rng.normal(scale=0.05, size=(n_tris, 2, 3))
    tri = np.concatenate([base, base + off], axis=1).astype(np.float32)
    return tri


def _rays(n, seed=5):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.2, 1.2, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d.astype(np.float32)


@pytest.fixture(scope="module")
def soup_setup():
    import jax.numpy as jnp

    from nebulae_tpu.bvh.builder import build_bvh
    from nebulae_tpu.kernels.pallas_trace import pack_bvh_chunks, pack_bvh_for_pallas

    tri = _soup()
    bvh = build_bvh(tri)
    packed = {k: jnp.asarray(v) for k, v in pack_bvh_for_pallas(bvh, tri).items()}
    chunks = [
        {k: jnp.asarray(v) for k, v in c.items()}
        for c in pack_bvh_chunks(bvh, tri, max_tris=256)
    ]
    assert len(chunks) >= 4, "chunking must actually split this scene"
    return tri, packed, chunks


def test_pallas_closest_matches_oracle(soup_setup):
    import jax.numpy as jnp

    from nebulae_tpu.kernels.pallas_trace import pallas_closest_hit
    from nebulae_tpu.ref.tracer import intersect_closest_np

    tri, packed, _ = soup_setup
    o, d = _rays(1024)
    ref = intersect_closest_np(o, d, tri)
    out = pallas_closest_hit(jnp.asarray(o), jnp.asarray(d), packed, interpret=True)
    hit_ref = ref["tri"] >= 0
    np.testing.assert_array_equal(hit_ref, np.asarray(out["tri"]) >= 0)
    np.testing.assert_allclose(ref["t"][hit_ref], np.asarray(out["t"])[hit_ref], rtol=1e-4, atol=1e-5)
    assert (ref["tri"][hit_ref] == np.asarray(out["tri"])[hit_ref]).mean() > 0.99


def test_pallas_chunked_matches_single(soup_setup):
    import jax.numpy as jnp

    from nebulae_tpu.kernels.pallas_trace import pallas_closest_chunks, pallas_closest_hit

    tri, packed, chunks = soup_setup
    o, d = _rays(1024, seed=9)
    one = pallas_closest_hit(jnp.asarray(o), jnp.asarray(d), packed, interpret=True)
    many = pallas_closest_chunks(jnp.asarray(o), jnp.asarray(d), chunks, interpret=True)
    hit = np.asarray(one["tri"]) >= 0
    np.testing.assert_array_equal(hit, np.asarray(many["tri"]) >= 0)
    np.testing.assert_allclose(
        np.asarray(one["t"])[hit], np.asarray(many["t"])[hit], rtol=1e-5, atol=1e-6
    )


def test_pallas_chunked_fat4_matches_single(soup_setup):
    """wide=4 chunks (fat4 tables per subtree) match the single table."""
    import jax.numpy as jnp

    from nebulae_tpu.bvh.builder import build_bvh
    from nebulae_tpu.kernels.pallas_trace import (
        pack_bvh_chunks,
        pallas_closest_chunks,
        pallas_closest_hit,
        pallas_shadow_closest_chunks,
    )

    tri, packed, _ = soup_setup
    bvh = build_bvh(tri)
    chunks4 = [
        {k: jnp.asarray(v) for k, v in c.items()}
        for c in pack_bvh_chunks(bvh, tri, max_tris=256, wide=4)
    ]
    assert any("fat4nodes" in c for c in chunks4)
    o, d = _rays(1024, seed=9)
    one = pallas_closest_hit(jnp.asarray(o), jnp.asarray(d), packed, interpret=True)
    many = pallas_closest_chunks(jnp.asarray(o), jnp.asarray(d), chunks4, interpret=True)
    hit = np.asarray(one["tri"]) >= 0
    np.testing.assert_array_equal(hit, np.asarray(many["tri"]) >= 0)
    np.testing.assert_allclose(
        np.asarray(one["t"])[hit], np.asarray(many["t"])[hit], rtol=1e-5, atol=1e-6
    )
    _, l = _rays(1024, seed=41)
    hit_c, occ_c = pallas_shadow_closest_chunks(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(l), chunks4, t_max_l=0.5, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(hit_c["tri"]) >= 0, hit
    )


def test_pallas_any_hit_matches_oracle(soup_setup):
    import jax.numpy as jnp

    from nebulae_tpu.kernels.pallas_trace import pallas_any_chunks, pallas_any_hit
    from nebulae_tpu.ref.tracer import intersect_any_np

    tri, packed, chunks = soup_setup
    o, d = _rays(1024, seed=3)
    ref = intersect_any_np(o, d, tri)
    occ = np.asarray(pallas_any_hit(jnp.asarray(o), jnp.asarray(d), packed, interpret=True))
    np.testing.assert_array_equal(ref, occ)
    occ_c = np.asarray(pallas_any_chunks(jnp.asarray(o), jnp.asarray(d), chunks, interpret=True))
    np.testing.assert_array_equal(ref, occ_c)


def test_pallas_per_ray_tmax(soup_setup):
    """Per-ray caps: rays capped below their hit distance must miss."""
    import jax.numpy as jnp

    from nebulae_tpu.kernels.pallas_trace import pallas_closest_hit

    tri, packed, _ = soup_setup
    o, d = _rays(512, seed=21)
    base = pallas_closest_hit(jnp.asarray(o), jnp.asarray(d), packed, interpret=True)
    t = np.asarray(base["t"])
    hit = np.asarray(base["tri"]) >= 0
    cap = np.where(hit, t * 0.5, 1e30).astype(np.float32)
    capped = pallas_closest_hit(
        jnp.asarray(o), jnp.asarray(d), packed, t_max=jnp.asarray(cap), interpret=True
    )
    # Everything that hit at t now has cap t/2 -> no hit at-or-beyond cap.
    ct = np.asarray(capped["t"])
    cm = np.asarray(capped["tri"]) >= 0
    assert not (cm & hit & (ct >= cap)).any()
    assert (~cm[hit]).mean() > 0.5  # most capped rays lose their hit


def test_pallas_dead_rays_miss(soup_setup):
    """Ejected lanes (DEAD_ORIGIN) and zero-direction padding never hit."""
    import jax.numpy as jnp

    from nebulae_tpu.kernels.pallas_trace import pallas_any_hit, pallas_closest_hit
    from nebulae_tpu.tracer.sorting import DEAD_ORIGIN

    tri, packed, _ = soup_setup
    o, d = _rays(256, seed=2)
    o[:128] = DEAD_ORIGIN
    out = pallas_closest_hit(jnp.asarray(o), jnp.asarray(d), packed, interpret=True)
    assert (np.asarray(out["tri"])[:128] == -1).all()
    occ = pallas_any_hit(jnp.asarray(o), jnp.asarray(d), packed, interpret=True)
    assert not np.asarray(occ)[:128].any()


def test_renderer_chunked_matches_single(cornell_scene, cornell_camera):
    """Full Renderer parity: forced-chunk Pallas vs single-table Pallas."""
    import jax.numpy as jnp

    from nebulae_tpu.bvh import build_bvh_fast
    from nebulae_tpu.config import RenderConfig
    from nebulae_tpu.engine.renderer import Renderer
    from nebulae_tpu.kernels.pallas_trace import pack_bvh_chunks, pack_bvh_for_pallas

    fs = cornell_scene.flat
    cfg = RenderConfig(
        width=32, height=32, max_bounces=2, enable_svgf=False, enable_tonemap=False,
        tracer="pallas",
    )
    flat_bvh = build_bvh_fast(fs.tri_pos, max_leaf=cfg.bvh_max_leaf)

    bvh1 = flat_bvh.device_arrays()
    bvh1.update(pack_bvh_for_pallas(flat_bvh, fs.tri_pos))
    img1 = np.asarray(Renderer(fs, cfg, bvh=bvh1).render(cornell_camera)["hdr"])

    bvh2 = flat_bvh.device_arrays()
    bvh2["chunks"] = pack_bvh_chunks(flat_bvh, fs.tri_pos, max_tris=8)
    assert len(bvh2["chunks"]) >= 2
    img2 = np.asarray(Renderer(fs, cfg, bvh=bvh2).render(cornell_camera)["hdr"])

    np.testing.assert_allclose(img1, img2, rtol=1e-5, atol=1e-6)


def test_renderer_wide4_matches_wide2(cornell_scene, cornell_camera):
    """Full Renderer parity: bvh_wide=4 (fat4 tables + combo) vs default."""
    from nebulae_tpu.config import RenderConfig
    from nebulae_tpu.engine.renderer import Renderer

    fs = cornell_scene.flat
    base = dict(
        width=32, height=32, max_bounces=2, enable_svgf=False, enable_tonemap=False,
        tracer="pallas",
    )
    img2 = np.asarray(Renderer(fs, RenderConfig(**base)).render(cornell_camera)["hdr"])
    img4 = np.asarray(
        Renderer(fs, RenderConfig(**base, bvh_wide=4)).render(cornell_camera)["hdr"]
    )
    np.testing.assert_allclose(img2, img4, rtol=1e-5, atol=1e-6)


def test_pallas_fat_matches_legacy(soup_setup):
    """Fat (children-at-parent) kernels are bit-identical to the legacy
    one-node-per-visit kernels on closest and any hit."""
    import jax.numpy as jnp

    from nebulae_tpu.bvh.builder import build_bvh
    from nebulae_tpu.kernels.pallas_trace import (
        pack_bvh_fat,
        pallas_any_hit,
        pallas_any_hit_fat,
        pallas_closest_hit,
        pallas_closest_hit_fat,
    )

    tri, packed, _ = soup_setup
    fat = {k: jnp.asarray(v) for k, v in pack_bvh_fat(build_bvh(tri), tri).items()}
    o, d = _rays(1024, seed=17)
    leg = pallas_closest_hit(jnp.asarray(o), jnp.asarray(d), packed, interpret=True)
    out = pallas_closest_hit_fat(jnp.asarray(o), jnp.asarray(d), fat, interpret=True)
    for k in ("t", "tri", "u", "v"):
        a = np.nan_to_num(np.asarray(leg[k]), posinf=1e30)
        b = np.nan_to_num(np.asarray(out[k]), posinf=1e30)
        np.testing.assert_array_equal(a, b)
    occ_leg = np.asarray(pallas_any_hit(jnp.asarray(o), jnp.asarray(d), packed, interpret=True))
    occ_fat = np.asarray(pallas_any_hit_fat(jnp.asarray(o), jnp.asarray(d), fat, interpret=True))
    np.testing.assert_array_equal(occ_leg, occ_fat)


def test_pallas_fat4_matches_fat(soup_setup):
    """Fat4 (grandchildren-at-node) kernels are bit-identical to fat(2) on
    closest and any hit, including capped t_max."""
    import jax.numpy as jnp

    from nebulae_tpu.bvh.builder import build_bvh
    from nebulae_tpu.kernels.pallas_trace import (
        pack_bvh_fat,
        pack_bvh_fat4,
        pallas_any_hit_fat,
        pallas_any_hit_fat4,
        pallas_closest_hit_fat,
        pallas_closest_hit_fat4,
    )

    tri, _, _ = soup_setup
    bvh = build_bvh(tri)
    fat = {k: jnp.asarray(v) for k, v in pack_bvh_fat(bvh, tri).items()}
    fat4 = {k: jnp.asarray(v) for k, v in pack_bvh_fat4(bvh, tri).items()}
    o, d = _rays(1024, seed=23)
    ref = pallas_closest_hit_fat(jnp.asarray(o), jnp.asarray(d), fat, interpret=True)
    out = pallas_closest_hit_fat4(jnp.asarray(o), jnp.asarray(d), fat4, interpret=True)
    for k in ("t", "tri", "u", "v"):
        a = np.nan_to_num(np.asarray(ref[k]), posinf=1e30)
        b = np.nan_to_num(np.asarray(out[k]), posinf=1e30)
        np.testing.assert_array_equal(a, b)
    occ_ref = np.asarray(
        pallas_any_hit_fat(jnp.asarray(o), jnp.asarray(d), fat, t_max=0.4, interpret=True)
    )
    occ4 = np.asarray(
        pallas_any_hit_fat4(jnp.asarray(o), jnp.asarray(d), fat4, t_max=0.4, interpret=True)
    )
    np.testing.assert_array_equal(occ_ref, occ4)


def test_pallas_combo_fat4_matches_fat4(soup_setup):
    """Fused shadow+bounce fat4 kernel matches the separate fat4 kernels."""
    import jax.numpy as jnp

    from nebulae_tpu.bvh.builder import build_bvh
    from nebulae_tpu.kernels.pallas_trace import (
        pack_bvh_fat4,
        pallas_any_hit_fat4,
        pallas_closest_hit_fat4,
        pallas_shadow_closest_fat4,
    )

    tri, _, _ = soup_setup
    bvh = build_bvh(tri)
    fat4 = {k: jnp.asarray(v) for k, v in pack_bvh_fat4(bvh, tri).items()}
    o, b = _rays(1024, seed=31)
    _, l = _rays(1024, seed=37)
    hit_c, occ_c = pallas_shadow_closest_fat4(
        jnp.asarray(o), jnp.asarray(b), jnp.asarray(l), fat4,
        t_max_l=0.5, interpret=True,
    )
    hit_s = pallas_closest_hit_fat4(jnp.asarray(o), jnp.asarray(b), fat4, interpret=True)
    occ_s = pallas_any_hit_fat4(jnp.asarray(o), jnp.asarray(l), fat4, t_max=0.5, interpret=True)
    for k in ("t", "tri", "u", "v"):
        a = np.nan_to_num(np.asarray(hit_s[k]), posinf=1e30)
        c = np.nan_to_num(np.asarray(hit_c[k]), posinf=1e30)
        np.testing.assert_array_equal(a, c)
    np.testing.assert_array_equal(np.asarray(occ_s), np.asarray(occ_c))


def test_pallas_mxu_fetch_matches_vpu(soup_setup):
    """The MXU one-hot matvec lane select produces bit-identical traversal
    results to the VPU mask+reduce path (interpret mode checks logic; the
    real-chip exactness gate lives in _fat4bench.py)."""
    import jax
    import jax.numpy as jnp

    from nebulae_tpu.kernels import pallas_trace as pt

    tri, packed, _ = soup_setup
    o, d = _rays(1024, seed=29)
    prev = pt._FETCH_MODE
    try:
        pt._FETCH_MODE = "vpu"
        jax.clear_caches()
        ref = pt.pallas_closest_hit(jnp.asarray(o), jnp.asarray(d), packed, interpret=True)
        pt._FETCH_MODE = "mxu"
        jax.clear_caches()
        out = pt.pallas_closest_hit(jnp.asarray(o), jnp.asarray(d), packed, interpret=True)
    finally:
        pt._FETCH_MODE = prev
        jax.clear_caches()
    for k in ("t", "tri", "u", "v"):
        a = np.nan_to_num(np.asarray(ref[k]), posinf=1e30)
        b = np.nan_to_num(np.asarray(out[k]), posinf=1e30)
        np.testing.assert_array_equal(a, b)


def test_pallas_fat_tmax_and_dead_rays(soup_setup):
    import jax.numpy as jnp

    from nebulae_tpu.bvh.builder import build_bvh
    from nebulae_tpu.kernels.pallas_trace import pack_bvh_fat, pallas_closest_hit_fat
    from nebulae_tpu.tracer.sorting import DEAD_ORIGIN

    tri, _, _ = soup_setup
    fat = {k: jnp.asarray(v) for k, v in pack_bvh_fat(build_bvh(tri), tri).items()}
    o, d = _rays(512, seed=23)
    base = pallas_closest_hit_fat(jnp.asarray(o), jnp.asarray(d), fat, interpret=True)
    t = np.asarray(base["t"])
    hit = np.asarray(base["tri"]) >= 0
    cap = np.where(hit, t * 0.5, 1e30).astype(np.float32)
    capped = pallas_closest_hit_fat(
        jnp.asarray(o), jnp.asarray(d), fat, t_max=jnp.asarray(cap), interpret=True
    )
    cm = np.asarray(capped["tri"]) >= 0
    assert not (cm & hit & (np.asarray(capped["t"]) >= cap)).any()
    o[:128] = DEAD_ORIGIN
    out = pallas_closest_hit_fat(jnp.asarray(o), jnp.asarray(d), fat, interpret=True)
    assert (np.asarray(out["tri"])[:128] == -1).all()


def test_pallas_combo_matches_separate(soup_setup):
    """Fused shadow+bounce traversal == separate closest + any kernels,
    including disabled lanes via zero t caps, single-table and chunked."""
    import jax
    import jax.numpy as jnp

    from nebulae_tpu.bvh.builder import build_bvh
    from nebulae_tpu.kernels.pallas_trace import (
        pack_bvh_chunks,
        pack_bvh_fat,
        pallas_any_hit_fat,
        pallas_closest_hit_fat,
        pallas_shadow_closest_chunks,
        pallas_shadow_closest_fat,
    )

    tri, _, _ = soup_setup
    bvh = build_bvh(tri, max_leaf=8)
    fat = {k: jnp.asarray(v) for k, v in pack_bvh_fat(bvh, tri).items()}
    rng = np.random.default_rng(31)
    o, b = _rays(1024, seed=41)
    l = rng.normal(size=(1024, 3)).astype(np.float32)
    l /= np.linalg.norm(l, axis=-1, keepdims=True)
    alive = rng.random(1024) > 0.3
    shoot = rng.random(1024) > 0.4
    t_b = jnp.where(jnp.asarray(alive), jnp.inf, 0.0)
    t_l = jnp.where(jnp.asarray(shoot), jnp.inf, 0.0)

    hit_c, occ_c = pallas_shadow_closest_fat(
        jnp.asarray(o), jnp.asarray(b), jnp.asarray(l), fat,
        t_max_b=t_b, t_max_l=t_l, interpret=True,
    )
    ob = np.where(alive[:, None], o, 1e14)
    ol = np.where(shoot[:, None], o, 1e14)
    hit_s = pallas_closest_hit_fat(jnp.asarray(ob), jnp.asarray(b), fat, interpret=True)
    occ_s = pallas_any_hit_fat(jnp.asarray(ol), jnp.asarray(l), fat, interpret=True)
    for k in ("t", "tri", "u", "v"):
        np.testing.assert_array_equal(
            np.nan_to_num(np.asarray(hit_s[k]), posinf=1e30),
            np.nan_to_num(np.asarray(hit_c[k]), posinf=1e30),
        )
    np.testing.assert_array_equal(np.asarray(occ_s), np.asarray(occ_c))

    chunks = [jax.tree.map(jnp.asarray, c) for c in pack_bvh_chunks(bvh, tri, max_tris=256)]
    hit_k, occ_k = pallas_shadow_closest_chunks(
        jnp.asarray(o), jnp.asarray(b), jnp.asarray(l), chunks,
        t_max_b=t_b, t_max_l=t_l, interpret=True,
    )
    for k in ("t", "tri", "u", "v"):
        np.testing.assert_array_equal(
            np.nan_to_num(np.asarray(hit_s[k]), posinf=1e30),
            np.nan_to_num(np.asarray(hit_k[k]), posinf=1e30),
        )
    np.testing.assert_array_equal(np.asarray(occ_s), np.asarray(occ_k))


def test_pallas_tri_group_parity(soup_setup):
    """Grouped tri slots (G tris per leaf fetch) are bit-identical to the
    ungrouped layout for closest, any, and the fused combo, across widths."""
    import jax.numpy as jnp

    from nebulae_tpu.bvh.builder import build_bvh
    from nebulae_tpu.kernels.pallas_trace import (
        pack_bvh_fat,
        pack_bvh_fat4,
        pallas_any_hit_fat,
        pallas_any_hit_fat4,
        pallas_closest_hit_fat,
        pallas_closest_hit_fat4,
        pallas_shadow_closest_fat4,
    )

    tri, _, _ = soup_setup
    bvh = build_bvh(tri, max_leaf=15)
    o, b = _rays(1024, seed=41)
    o_j, b_j = jnp.asarray(o), jnp.asarray(b)
    _, l = _rays(1024, seed=43)
    l_j = jnp.asarray(l)

    f4_1 = {k: jnp.asarray(v) for k, v in pack_bvh_fat4(bvh, tri, tri_group=1).items()}
    f4_8 = {k: jnp.asarray(v) for k, v in pack_bvh_fat4(bvh, tri, tri_group=8).items()}
    h1 = pallas_closest_hit_fat4(o_j, b_j, f4_1, interpret=True)
    h8 = pallas_closest_hit_fat4(o_j, b_j, f4_8, interpret=True)
    for k in ("t", "tri", "u", "v"):
        a = np.nan_to_num(np.asarray(h1[k]), posinf=1e30)
        c = np.nan_to_num(np.asarray(h8[k]), posinf=1e30)
        np.testing.assert_array_equal(a, c)
    occ1 = pallas_any_hit_fat4(o_j, l_j, f4_1, t_max=0.5, interpret=True)
    occ8 = pallas_any_hit_fat4(o_j, l_j, f4_8, t_max=0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occ8))
    hc1, oc1 = pallas_shadow_closest_fat4(o_j, b_j, l_j, f4_1, t_max_l=0.5, interpret=True)
    hc8, oc8 = pallas_shadow_closest_fat4(o_j, b_j, l_j, f4_8, t_max_l=0.5, interpret=True)
    for k in ("t", "tri", "u", "v"):
        a = np.nan_to_num(np.asarray(hc1[k]), posinf=1e30)
        c = np.nan_to_num(np.asarray(hc8[k]), posinf=1e30)
        np.testing.assert_array_equal(a, c)
    np.testing.assert_array_equal(np.asarray(oc1), np.asarray(oc8))

    # fat(2) path, odd group size exercises tail padding
    f2_1 = {k: jnp.asarray(v) for k, v in pack_bvh_fat(bvh, tri, tri_group=1).items()}
    f2_3 = {k: jnp.asarray(v) for k, v in pack_bvh_fat(bvh, tri, tri_group=3).items()}
    g1 = pallas_closest_hit_fat(o_j, b_j, f2_1, interpret=True)
    g3 = pallas_closest_hit_fat(o_j, b_j, f2_3, interpret=True)
    for k in ("t", "tri", "u", "v"):
        a = np.nan_to_num(np.asarray(g1[k]), posinf=1e30)
        c = np.nan_to_num(np.asarray(g3[k]), posinf=1e30)
        np.testing.assert_array_equal(a, c)
    a2_1 = pallas_any_hit_fat(o_j, l_j, f2_1, t_max=0.5, interpret=True)
    a2_3 = pallas_any_hit_fat(o_j, l_j, f2_3, t_max=0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(a2_1), np.asarray(a2_3))


def test_pallas_tri_chunks_match_single_table():
    """Whole-tree nodes + triangle chunks (pack_bvh_tri_chunks): closest,
    any-hit, and the fused shadow+bounce walk all match the single-table
    fat4 kernel exactly -- leaves outside the resident chunk are skipped and
    covered by a later pass with tightened caps."""
    import jax
    import jax.numpy as jnp

    from nebulae_tpu.bvh.builder import build_bvh
    from nebulae_tpu.kernels import pallas_trace as pt

    tri = _soup(2000, seed=23)
    bvh = build_bvh(tri, max_leaf=8)
    single = pt.pack_bvh_fat4(bvh, tri, tri_group=4)
    single = {k: jnp.asarray(v) for k, v in single.items() if k != "fat4_slots"}

    # Force chunking by shrinking the budget (restore afterwards).
    old_budget = pt.TRI_CHUNK_TABLE_BUDGET
    pt.TRI_CHUNK_TABLE_BUDGET = single["fat4nodes"].nbytes + 32 * 1024
    try:
        packed = pt.pack_bvh_tri_chunks(bvh, tri, tri_group=4)
    finally:
        pt.TRI_CHUNK_TABLE_BUDGET = old_budget
    assert packed is not None and len(packed["tri_chunks"]) >= 3, (
        packed and len(packed["tri_chunks"])
    )
    packed = {
        "fat4nodes": jnp.asarray(packed["fat4nodes"]),
        "tri_chunks": [jax.tree.map(jnp.asarray, c) for c in packed["tri_chunks"]],
    }

    o, d = _rays(1024, seed=31)
    one = pt.pallas_closest_hit_fat4(jnp.asarray(o), jnp.asarray(d), single, interpret=True)
    many = pt.pallas_closest_tri_chunks(jnp.asarray(o), jnp.asarray(d), packed, interpret=True)
    np.testing.assert_array_equal(np.asarray(one["tri"]), np.asarray(many["tri"]))
    hit = np.asarray(one["tri"]) >= 0
    np.testing.assert_allclose(
        np.asarray(one["t"])[hit], np.asarray(many["t"])[hit], rtol=1e-6, atol=1e-7
    )

    occ1 = np.asarray(pt.pallas_any_hit_fat4(jnp.asarray(o), jnp.asarray(d), single, interpret=True))
    occ2 = np.asarray(pt.pallas_any_tri_chunks(jnp.asarray(o), jnp.asarray(d), packed, interpret=True))
    np.testing.assert_array_equal(occ1, occ2)

    _, l = _rays(1024, seed=32)
    h1, s1 = pt.pallas_shadow_closest_fat4(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(l), single, t_max_l=0.6, interpret=True
    )
    h2, s2 = pt.pallas_shadow_closest_tri_chunks(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(l), packed, t_max_l=0.6, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(h1["tri"]), np.asarray(h2["tri"]))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_pallas_paged_match_resident():
    """Demand-paged traversal (tri table in HBM behind a PAGE_WAYS x
    PAGE_TILES VMEM cache) matches the VMEM-resident fat4 kernels exactly
    on closest, any-hit, and the fused shadow+bounce walk."""
    import jax.numpy as jnp

    from nebulae_tpu.bvh.builder import build_bvh
    from nebulae_tpu.kernels import pallas_trace as pt

    tri = _soup(2400, seed=29)
    bvh = build_bvh(tri, max_leaf=8)
    packed = pt.pack_bvh_fat4(bvh, tri, tri_group=1)
    single = {k: jnp.asarray(v) for k, v in packed.items() if k != "fat4_slots"}
    paged = dict(single, tris=jnp.asarray(pt.pad_tris_for_paging(packed["tris"])))
    assert paged["tris"].shape[0] >= 3 * pt.PAGE_TILES, paged["tris"].shape

    o, d = _rays(512, seed=41)
    o, d = jnp.asarray(o), jnp.asarray(d)
    one = pt.pallas_closest_hit_fat4(o, d, single, interpret=True)
    two = pt.pallas_closest_hit_fat4(o, d, paged, interpret=True, paged=True)
    np.testing.assert_array_equal(np.asarray(one["tri"]), np.asarray(two["tri"]))
    hit = np.asarray(one["tri"]) >= 0
    np.testing.assert_allclose(
        np.asarray(one["t"])[hit], np.asarray(two["t"])[hit], rtol=1e-6, atol=1e-7
    )

    a1 = pt.pallas_any_hit_fat4(o, d, single, t_max=0.6, interpret=True)
    a2 = pt.pallas_any_hit_fat4(o, d, paged, t_max=0.6, interpret=True, paged=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    _, l = _rays(512, seed=42)
    l = jnp.asarray(l)
    h1, s1 = pt.pallas_shadow_closest_fat4(o, d, l, single, t_max_l=0.6, interpret=True)
    h2, s2 = pt.pallas_shadow_closest_fat4(
        o, d, l, paged, t_max_l=0.6, interpret=True, paged=True
    )
    np.testing.assert_array_equal(np.asarray(h1["tri"]), np.asarray(h2["tri"]))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
