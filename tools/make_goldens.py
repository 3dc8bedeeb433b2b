"""Generate golden-image regression baselines (tests/goldens/*.npz).

Extends the reference's golden-dump escape hatch (GIProcessedScene.cpp:95-123
dumps CPU-side geometry binaries behind #if 0) to full rendered images: small
deterministic frames through the public Renderer API on the CPU backend, the
exact configuration the test suite replays (tests/test_golden_images.py).

Rerun after an INTENTIONAL image change and commit the new .npz files:
    python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def procedural_envmap() -> np.ndarray:
    """The app's deterministic gradient sky (app.py --envmap procedural)."""
    th = np.linspace(0, np.pi, 64, dtype=np.float32)[:, None]
    up = np.clip(np.cos(th), 0, 1)
    env = np.zeros((64, 128, 3), np.float32)
    env[..., 0] = 0.9 - 0.55 * up
    env[..., 1] = 0.55 + 0.05 * up
    env[..., 2] = 0.35 + 0.55 * up
    return env


def golden_cases():
    """(name, render_fn) pairs; each render_fn() -> dict of images."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nebulae_tpu.config import RenderConfig
    from nebulae_tpu.core.camera import Camera
    from nebulae_tpu.core.scene import load_scene
    from nebulae_tpu.engine.renderer import Renderer

    cornell = load_scene("/root/reference/assets/cornell_box/cornell_box.gltf")
    fs = cornell.flat
    lo, hi = fs.aabb_min, fs.aabb_max
    center = (lo + hi) * 0.5
    cam = Camera(
        eye=center + np.array([0, 0, 2.6 * float((hi - lo).max())], np.float32), target=center
    )

    def direct():
        cfg = RenderConfig(width=64, height=64, enable_gi=False, enable_svgf=False,
                           enable_tonemap=False)
        out = Renderer(fs, cfg).render(cam)
        return {"hdr": np.asarray(out["hdr"])}

    def gi_svgf():
        cfg = RenderConfig(width=64, height=64, max_bounces=3, enable_svgf=True,
                           enable_tonemap=True, svgf_atrous_passes=5)
        r = Renderer(fs, cfg)
        out = r.render(cam)
        out = r.render(cam)  # one frame of temporal history
        return {
            "hdr": np.asarray(out["hdr"]),
            "denoised": np.asarray(out["denoised"]),
            "ldr": np.asarray(out["ldr"]),
        }

    def nrc():
        cfg = RenderConfig(width=64, height=64, max_bounces=3, enable_nrc=True,
                           nrc_max_path_vertices=4, enable_svgf=False, enable_tonemap=False)
        r = Renderer(fs, cfg)
        out = r.render(cam)
        out = r.render(cam)  # cache has trained for 2 frames (deterministic)
        return {"hdr": np.asarray(out["hdr"])}

    def helmet_ibl():
        helmet = load_scene(
            "/root/reference/assets/DamagedHelmet/DamagedHelmet.gltf", max_texture_dim=256
        )
        hfs = helmet.flat
        hlo, hhi = hfs.aabb_min, hfs.aabb_max
        hcenter = (hlo + hhi) * 0.5
        hcam = Camera(
            eye=hcenter + np.array([0.6, 0.3, 2.0], np.float32) * float((hhi - hlo).max()),
            target=hcenter,
        )
        cfg = RenderConfig(width=64, height=64, enable_gi=False, enable_svgf=False,
                           enable_tonemap=True, enable_envmap=True)
        import jax.numpy as jnp

        r = Renderer(hfs, cfg)
        r.scene["env_map"] = jnp.asarray(procedural_envmap())
        out = r.render(hcam)
        return {"ldr": np.asarray(out["ldr"])}

    return [
        ("cornell_direct", direct),
        ("cornell_gi_svgf", gi_svgf),
        ("cornell_nrc", nrc),
        ("helmet_ibl", helmet_ibl),
    ]


def main() -> int:
    from nebulae_tpu.utils.golden import dump_golden

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in golden_cases():
        imgs = fn()
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        dump_golden(path, imgs)
        stats = {k: f"mean={v.mean():.4f}" for k, v in imgs.items()}
        print(f"wrote {path}: {stats}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
