"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip shardings are validated without TPU hardware via
--xla_force_host_platform_device_count (SURVEY.md section 4); the benchmark
(bench.py) is what runs on the real chip.
"""

import os

# Force CPU regardless of the ambient environment (the shell may export
# JAX_PLATFORMS=axon for the TPU tunnel; tests must never grab the chip).
# jax may already be imported by a pytest plugin before this conftest runs,
# so set the config directly too -- the backend initializes lazily.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

ASSETS = "/root/reference/assets"
CORNELL = f"{ASSETS}/cornell_box/cornell_box.gltf"
HELMET = f"{ASSETS}/DamagedHelmet/DamagedHelmet.gltf"
# NOTE: the mounted snapshot ships only Sponza's textures (no Sponza.bin /
# .glb geometry), so there is no Sponza fixture; Sponza-scale coverage comes
# from utils.testscenes.helmet_field (4x4 ~= 247k tris, chunked BVH).


@pytest.fixture(scope="session")
def cornell_scene():
    from nebulae_tpu.core.scene import load_scene

    return load_scene(CORNELL)


@pytest.fixture(scope="session")
def cornell_camera(cornell_scene):
    from nebulae_tpu.core.camera import Camera

    lo = cornell_scene.flat.aabb_min
    hi = cornell_scene.flat.aabb_max
    center = (lo + hi) * 0.5
    # Look into the box opening along +Z (cornell faces +z after import)
    eye = center + np.array([0.0, 0.0, 2.6 * float((hi - lo).max())], np.float32)
    return Camera(eye=eye, target=center, fov_y_deg=60.0)


@pytest.fixture(scope="session")
def helmet_scene():
    from nebulae_tpu.core.scene import load_scene

    return load_scene(HELMET, max_texture_dim=512)


# ---------------------------------------------------------------------------
# Fast subset (-m fast, <2 min): inner-loop smoke coverage across every
# subsystem; the full suite stays the pre-commit gate.  Slow entries chosen
# from measured durations (pytest --durations, round 5).
SLOW_MODULES = {
    "test_multiprocess",   # spawns worker processes (~200 s)
    "test_refit",          # renderer-level rebuild comparisons (~200 s)
    "test_pipeline",       # CPU-oracle allclose + SVGF grad (~170 s)
    "test_nrc",            # online-training convergence loops (~110 s)
    "test_pallas_kernel",  # chunk/paged/wide parity sweeps (~140 s)
    "test_mips",           # mip-chain renders (~80 s)
    "test_pallas_svgf",    # a-trous parity incl. gradients (~110 s)
    "test_bucket_schedule",  # scheduled-vs-exact renders (~180 s)
}
SLOW_TESTS = {
    "test_collective_volume_and_shard_balance",
    "test_nrc_train_step_collectives_bounded",
    "test_sharded_train_step_grads_match",
    "test_resize_keeps_nrc_cache",
    "test_runtime_controls",
    "test_moving_camera_accumulates_with_reprojection",
    "test_helmet_ibl_material_gradients",
}


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: excluded from the -m fast inner-loop subset")
    config.addinivalue_line("markers", "fast: inner-loop smoke subset (<2 min)")


def pytest_collection_modifyitems(config, items):
    for it in items:
        mod = it.module.__name__.rsplit(".", 1)[-1]
        base = it.name.split("[")[0]
        if mod in SLOW_MODULES or base in SLOW_TESTS:
            it.add_marker(pytest.mark.slow)
        else:
            it.add_marker(pytest.mark.fast)
