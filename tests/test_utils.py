"""Auxiliary subsystems: checkpoint/resume, golden dumps, display, app CLI."""

import numpy as np


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from nebulae_tpu.config import RenderConfig
    from nebulae_tpu.engine.renderer import init_frame_state
    from nebulae_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = RenderConfig(width=16, height=16, enable_nrc=True)
    state = init_frame_state(cfg)
    state["frame"] = jnp.uint32(42)
    d = save_checkpoint(tmp_path / "ckpt", state, step=7)
    restored = load_checkpoint(d, init_frame_state(cfg))
    assert int(restored["frame"]) == 42
    a = np.asarray(state["nrc"]["params"][0]["w"])
    b = np.asarray(restored["nrc"]["params"][0]["w"])
    np.testing.assert_array_equal(a, b)


def test_golden_roundtrip(tmp_path, cornell_scene):
    from nebulae_tpu.utils.golden import compare_golden, dump_golden

    tree = cornell_scene.flat.device_arrays()
    p = tmp_path / "scene.npz"
    dump_golden(p, tree)
    assert compare_golden(p, tree) == []
    bad = dict(tree)
    bad["mat_base_color"] = tree["mat_base_color"] + 0.5
    problems = compare_golden(p, bad)
    assert any("mat_base_color" in x for x in problems)


def test_display_writer(tmp_path):
    import numpy as np

    from nebulae_tpu.utils.display import FrameWriter, ldr_to_srgb_u8

    img = np.linspace(0, 1, 16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
    u8 = ldr_to_srgb_u8(img)
    assert u8.dtype == np.uint8 and u8.shape == (16, 16, 3)
    w = FrameWriter(tmp_path, fmt="png")
    for _ in range(3):
        w.present(img)
    w.flush()
    assert len(list(tmp_path.glob("frame_*.png"))) == 3


def test_app_cli_smoke(tmp_path):
    """End-to-end CLI run on the CPU backend (tiny frame)."""
    from nebulae_tpu.app import main

    rc = main(
        [
            "--scene", "/root/reference/assets/cornell_box/cornell_box.gltf",
            "--width", "32", "--height", "32", "--frames", "2", "--bounces", "2",
            "--out", str(tmp_path / "frames"), "--no-svgf",
        ]
    )
    assert rc == 0
    assert len(list((tmp_path / "frames").glob("*.png"))) == 2
    # Observability is load-bearing: the frame loop streams JSONL metrics and
    # touches the liveness file every frame (SURVEY.md section 5).
    import json

    rows = [json.loads(l) for l in (tmp_path / "frames" / "metrics.jsonl").read_text().splitlines()]
    assert len(rows) == 2 and all("frame_ms" in r for r in rows)
    assert (tmp_path / "frames" / "heartbeat").exists()


def test_crashdump_and_heartbeat(tmp_path):
    """Uncaught exceptions write a dump with the state snapshot (Nsight
    Aftermath analogue); the heartbeat goes stale without touches."""
    import json
    import sys

    from nebulae_tpu.utils import crashdump
    from nebulae_tpu.utils.crashdump import Heartbeat

    old_hook = sys.excepthook
    try:
        crashdump.install(
            state_provider=lambda: {"frame": np.uint32(7), "img": np.ones((2, 3), np.float32)},
            dump_dir=tmp_path / "crash",
        )
        assert sys.excepthook is crashdump._excepthook  # hook actually installed
        try:
            raise RuntimeError("boom")
        except RuntimeError:
            sys.excepthook(*sys.exc_info())  # what the interpreter would do
    finally:
        sys.excepthook = old_hook
    dumps = sorted((tmp_path / "crash").glob("crash_*.json"))
    assert dumps, "no crash dump written"
    meta = json.loads(dumps[-1].read_text())
    assert meta["reason"] == "RuntimeError" and "boom" in meta["detail"]
    states = list((tmp_path / "crash").glob("state_*.npz"))
    assert states, "no state snapshot written"
    snap = np.load(states[-1])
    assert int(snap["frame"]) == 7

    hb = Heartbeat(tmp_path / "hb", stale_after_s=0.05)
    assert hb.is_stale()  # never touched
    hb.touch()
    assert not hb.is_stale()
    import time

    time.sleep(0.06)
    assert hb.is_stale()


def test_logging_and_timer(capsys):
    from nebulae_tpu.utils.logging import log_info, log_warn, neb_assert
    from nebulae_tpu.utils.profiling import RaysPerSecond

    log_info("hello")
    log_warn("careful")
    neb_assert(True, "fine")
    try:
        neb_assert(False, "boom")
        raise RuntimeError("unreachable")
    except AssertionError:
        pass
    r = RaysPerSecond()
    r.add(1_000_000, 0.5)
    assert abs(r.mrays_s - 2.0) < 1e-6


def test_runtime_controls(tmp_path, cornell_scene, cornell_camera):
    """Runtime-mutable knobs (the ImGui-panel analogue): sun changes apply
    without recompiling, static knobs re-jit mid-run, and both visibly
    change the next frame."""
    from nebulae_tpu.app import apply_controls
    from nebulae_tpu.config import RenderConfig
    from nebulae_tpu.engine.renderer import Renderer

    cfg = RenderConfig(width=32, height=32, max_bounces=2, enable_svgf=False, enable_tonemap=False)
    r = Renderer(cornell_scene.flat, cfg)
    img0 = np.asarray(r.render(cornell_camera)["hdr"])

    apply_controls(r, {"sun_radiance": [0.0, 0.0, 0.0], "sky_color": [1.0, 0.0, 0.0]})
    img1 = np.asarray(r.render(cornell_camera)["hdr"])
    assert np.abs(img1 - img0).max() > 0.05  # lighting actually changed

    apply_controls(r, {"bounces": 1, "spp": 2})
    assert r.cfg.max_bounces == 1 and r.cfg.spp == 2
    img2 = np.asarray(r.render(cornell_camera)["hdr"])
    assert np.isfinite(img2).all()

    import pytest

    with pytest.raises(ValueError):
        import dataclasses

        r.update_config(dataclasses.replace(r.cfg, width=64))

    # Resolution goes through the WM_SIZE analogue: per-resolution state
    # reallocates, scene/BVH and render continuity survive.
    r.resize(64, 48)
    img3 = r.render(cornell_camera)["hdr"]
    assert img3.shape == (48, 64, 3)
    assert np.isfinite(np.asarray(img3)).all()


def test_resize_keeps_nrc_cache(cornell_scene, cornell_camera):
    """resize() reallocates frame state but the trained cache params carry
    over (the reference keeps the NRC context across WM_SIZE too)."""
    from nebulae_tpu.config import RenderConfig
    from nebulae_tpu.engine.renderer import Renderer

    cfg = RenderConfig(
        width=32, height=32, max_bounces=2, enable_svgf=False,
        enable_tonemap=False, enable_nrc=True,
    )
    import jax

    r = Renderer(cornell_scene.flat, cfg)
    r.render(cornell_camera)  # one frame of online training
    params_before = jax.tree.leaves(r.state["nrc"]["params"])
    r.resize(48, 32)
    params_after = jax.tree.leaves(r.state["nrc"]["params"])
    for a, b in zip(params_before, params_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out = r.render(cornell_camera)
    assert out["hdr"].shape == (32, 48, 3)


def test_app_accumulate(tmp_path):
    """--accumulate averages the frames' HDR into one converged still."""
    from nebulae_tpu.app import main

    rc = main(
        [
            "--scene", "/root/reference/assets/cornell_box/cornell_box.gltf",
            "--width", "32", "--height", "32", "--frames", "4", "--bounces", "2",
            "--out", str(tmp_path / "still"), "--no-svgf", "--accumulate",
        ]
    )
    assert rc == 0
    assert len(list((tmp_path / "still").glob("*.png"))) == 1


def test_preview_server_serves_latest_frame():
    """Live preview (the last ImGui-parity gap): the HTTP server returns the
    page and the most recently presented frame."""
    import urllib.request

    import numpy as np
    from PIL import Image
    import io

    from nebulae_tpu.utils.display import PreviewServer, ldr_to_srgb_u8

    srv = PreviewServer(port=0)  # ephemeral port
    try:
        img = np.zeros((8, 8, 3), np.float32)
        img[:, :4] = [1.0, 0.0, 0.0]
        srv.update(img)
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/", timeout=10
        ).read()
        assert b"frame.png" in page
        raw = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/frame.png", timeout=10
        ).read()
        got = np.asarray(Image.open(io.BytesIO(raw)))
        np.testing.assert_array_equal(got, ldr_to_srgb_u8(img))
        # update swaps the buffer
        srv.update(np.ones((4, 4, 3), np.float32))
        raw2 = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/frame.png", timeout=10
        ).read()
        assert np.asarray(Image.open(io.BytesIO(raw2))).shape == (4, 4, 3)
    finally:
        srv.close()
