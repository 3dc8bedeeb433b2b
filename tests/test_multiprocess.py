"""Multi-host simulation: 2 processes x 4 virtual CPU devices each.

SURVEY.md section 4's prescription for testing pod-style distribution
without hardware: every process runs tests/_mp_worker.py, which joins a
jax.distributed cluster, builds the global 8-device "rays" mesh, and runs
one NRC-enabled train step with pixels sharded across the process boundary
-- exercising coordinator bring-up, cross-process collectives (the gradient
all-reduce), and dist.mesh.initialize_distributed's underlying path.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_app_render_matches_single(tmp_path):
    """End-to-end multi-host app: 2 processes x 4 CPU devices render the
    Cornell GI+SVGF frame through `python -m nebulae_tpu.app --coordinator
    ... --num-processes 2`, host 0 gathers and writes the image; pixels must
    match the plain single-process app (the sharded == single contract of
    tests/test_dist.py, here across a real process boundary + the DCN image
    gather)."""
    import numpy as np
    from PIL import Image

    scene = "/root/reference/assets/cornell_box/cornell_box.gltf"
    base_env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    common = [
        sys.executable, "-m", "nebulae_tpu.app", "--scene", scene,
        "--width", "32", "--height", "32", "--frames", "2", "--bounces", "2",
        "--spp", "1", "--metrics", "off", "--orbit-speed", "3.0",
        # Frame-lagged bucket scheduling through the multi-process path:
        # frame 0 is the full-width bootstrap on both sides, frame 1 derives
        # the schedule from replicated counts (identical on every host).
        "--bucket-scheduling",
    ]
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    out_single = tmp_path / "single"
    env1 = dict(base_env)
    p = subprocess.run(
        common + ["--out", str(out_single)],
        capture_output=True, text=True, env=env1, cwd=cwd, timeout=600,
    )
    assert p.returncode == 0, p.stdout + p.stderr

    out_multi = tmp_path / "multi"
    port = _free_port()
    env2 = dict(base_env)
    env2["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            common + [
                "--out", str(out_multi),
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(pid),
            ],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env2, cwd=cwd,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=780)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("app workers timed out:\n" + "\n---\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"app worker failed:\n{out}"

    for frame in ("frame_00000.png", "frame_00001.png"):
        a = np.asarray(Image.open(out_single / frame), np.int16)
        b = np.asarray(Image.open(out_multi / frame), np.int16)
        # Identical math per pixel under SPMD; allow 1 u8 step for any
        # collective-order float wiggle at the quantization boundary.
        assert np.abs(a - b).max() <= 1, frame


def test_two_process_four_device_train_step():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(worker))),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=780)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n" + "\n---\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
        assert "MP_OK" in out, out


def test_kill_resume_continues_bit_consistent(tmp_path):
    """Elastic recovery (SURVEY.md section 5 -- green-field obligation): a
    2-process NRC training run is killed mid-run after a coordinated
    checkpoint lands; the cluster restarts with --resume from that
    checkpoint and the continued frames are bit-consistent with an
    uninterrupted run (same frame counter -> same RNG streams, SVGF history
    and cache state restored).  The reference has no persistence at all; a
    pod job that loses a host restarts exactly this way."""
    import time

    import numpy as np
    from PIL import Image

    scene = "/root/reference/assets/cornell_box/cornell_box.gltf"
    base_env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    base_env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def common(extra):
        return [
            sys.executable, "-m", "nebulae_tpu.app", "--scene", scene,
            "--width", "32", "--height", "32", "--bounces", "2", "--spp", "1",
            "--nrc", "--metrics", "off",
        ] + extra

    def launch(extra, port):
        return [
            subprocess.Popen(
                common(extra + [
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", "2", "--process-id", str(pid),
                ]),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=base_env, cwd=cwd,
            )
            for pid in range(2)
        ]

    ckpt = tmp_path / "ckpt"
    step_dir = ckpt / "step_00000002"

    # --- Run A: long run, checkpoint after frame 2; KILL once it lands.
    procs = launch(
        ["--frames", "64", "--out", str(tmp_path / "a"),
         "--checkpoint-dir", str(ckpt), "--checkpoint-every", "2"],
        _free_port(),
    )
    try:
        deadline = time.time() + 600
        while not step_dir.exists():
            if time.time() > deadline:
                pytest.fail("checkpoint never landed")
            for p in procs:
                if p.poll() is not None:
                    out, _ = p.communicate(timeout=10)
                    pytest.fail(f"worker died before checkpoint:\n{out}")
            time.sleep(1.0)
        time.sleep(2.0)  # orbax rename is atomic; settle the metadata write
    finally:
        # Kill worker 1 first (the mid-training failure), then worker 0
        # (which cannot make collective progress without its peer -- the
        # whole job restarts, as on a real pod).
        for p in reversed(procs):
            p.kill()
        for p in procs:
            p.communicate(timeout=60)

    # --- Run B: restart the cluster, resume from the checkpoint, 2 frames.
    out_b = tmp_path / "b"
    procs = launch(
        ["--frames", "2", "--out", str(out_b), "--resume", str(step_dir)],
        _free_port(),
    )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=780)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("resume workers timed out:\n" + "\n---\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"resume worker failed:\n{out}"

    # --- Run C: uninterrupted 4-frame reference.
    out_c = tmp_path / "c"
    procs = launch(["--frames", "4", "--out", str(out_c)], _free_port())
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=780)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("reference workers timed out:\n" + "\n---\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"reference worker failed:\n{out}"

    # Resumed frames 0,1 == uninterrupted frames 2,3 (1 u8 step tolerance
    # at the quantization boundary, as in the sharded==single contract).
    for resumed, reference in (("frame_00000.png", "frame_00002.png"),
                               ("frame_00001.png", "frame_00003.png")):
        a = np.asarray(Image.open(out_b / resumed), np.int16)
        b = np.asarray(Image.open(out_c / reference), np.int16)
        assert np.abs(a - b).max() <= 1, (resumed, reference)
