"""Application shell: CLI entry point + render loop.

The WinMain/Nebulae analogue (/root/reference/src/WinMain.cpp:274-368,
Nebulae.cpp:17-112) for a headless TPU: parse `--key=value` style arguments
(ArgumentParser.h semantics via argparse), load the scene, run the frame loop
with frametime logging, orbit-camera animation instead of mouse input, frames
"presented" to an output directory, and periodic NRC/scene checkpoints.

Usage:
    python -m nebulae_tpu.app --scene /path/to/scene.gltf --frames 64 \
        --width 1920 --height 1080 --nrc --out /tmp/frames
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("nebulae_tpu", description=__doc__)
    p.add_argument("--scene", required=True, help="glTF 2.0 scene (.gltf/.glb)")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--spp", type=int, default=1)
    p.add_argument("--bounces", type=int, default=8)
    p.add_argument("--nrc", action="store_true", help="enable the neural radiance cache")
    p.add_argument("--no-svgf", action="store_true")
    p.add_argument("--no-gi", action="store_true", help="direct lighting only")
    p.add_argument(
        "--envmap", default=None,
        help="lat-long environment map image for IBL sky, or 'procedural'",
    )
    p.add_argument("--tracer", default="auto", choices=["auto", "bruteforce", "bvh", "pallas"])
    p.add_argument("--out", default="/tmp/nebulae_frames")
    p.add_argument("--orbit-speed", type=float, default=0.0, help="deg/frame camera orbit")
    p.add_argument("--accumulate", action="store_true",
                   help="progressive still: average all frames' HDR (each frame advances "
                        "the RNG stream) and present one converged image at the end")
    p.add_argument("--animate", type=float, default=0.0, metavar="AMPL",
                   help="dynamic-scene demo: bob the geometry by AMPL x scene height "
                        "per frame cycle (BVH refit per frame, no rebuild)")
    p.add_argument("--distance-scale", type=float, default=2.2)
    p.add_argument("--max-texture-dim", type=int, default=1024)
    # Runtime knobs mirroring the reference's ImGui panels
    # (DeferredRenderer.cpp:161-252): sun/sky, throughput threshold, SVGF
    # temporal alpha, NRC learning rate.
    p.add_argument("--sun-dir", default=None, help="x,y,z toward the sun")
    p.add_argument("--sun-radiance", default=None, help="r,g,b")
    p.add_argument("--sun-angle-deg", type=float, default=None, help="sun disk diameter")
    p.add_argument("--sky-color", default=None, help="r,g,b constant sky")
    p.add_argument("--throughput-threshold", type=float, default=0.0)
    p.add_argument("--svgf-alpha", type=float, default=0.9)
    p.add_argument("--nrc-lr", type=float, default=1e-2)
    p.add_argument("--fast-bounce-shading", action="store_true")
    p.add_argument("--no-texture-mips", action="store_true",
                   help="disable primary-pass texture mip selection (UV-derivative "
                        "LOD, the raster G-buffer's hardware-mips analogue)")
    p.add_argument("--nrc-raw-radiance", action="store_true",
                   help="train the cache on raw outgoing radiance instead of the "
                        "learnIrradiance demodulated protocol")
    p.add_argument("--bvh-wide", type=int, default=4, choices=[2, 4],
                   help="fat traversal table width (children vs grandchildren per visit)")
    p.add_argument("--chunk-mode", default="auto",
                   choices=["auto", "subtree", "paged", "tri"],
                   help="large-scene traversal strategy past the VMEM-resident "
                        "table budget (auto picks; paged = HBM-streamed tris, "
                        "refittable at any size)")
    p.add_argument("--preview", type=int, default=None, metavar="PORT",
                   help="serve the latest frame at http://127.0.0.1:PORT/ "
                        "(live view; pair with --control-file for knobs)")
    p.add_argument("--bucket-scheduling", action="store_true",
                   help="frame-lagged static compaction buckets (no in-graph "
                        "live-count switch; one re-jit per schedule change)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=64)
    p.add_argument("--resume", default=None, help="checkpoint dir to restore state from")
    p.add_argument("--profile", default=None, help="capture an xprof trace to this dir")
    p.add_argument("--control-file", default=None,
                   help="JSON file polled every frame for runtime knob changes (the "
                        "headless ImGui panel, DeferredRenderer.cpp:161-252): sun_dir/"
                        "sun_radiance/sun_angle_deg/sky_color apply without recompiling; "
                        "spp/bounces/svgf_alpha/nrc/nrc_lr/throughput_threshold re-jit "
                        "like the reference's shader reload")
    p.add_argument("--metrics", default=None,
                   help="JSONL metrics stream path (default <out>/metrics.jsonl; 'off' disables)")
    p.add_argument("--crash-dir", default=None,
                   help="crash-dump directory (default $NEBULAE_CRASH_DIR or /tmp/nebulae_crash)")
    p.add_argument("--heartbeat", default=None,
                   help="liveness file touched every frame (default <out>/heartbeat)")
    # Multi-host / multi-chip (SURVEY.md section 2.8: rays shard over the
    # mesh, scene/BVH replicate, gradients all-reduce over ICI; hosts touch
    # DCN only for bring-up, the host-0 image gather, and checkpoints).
    p.add_argument("--coordinator", default=None,
                   help="process-0 address host:port for jax.distributed (multi-host)")
    p.add_argument("--num-processes", type=int, default=1,
                   help="total processes in the multi-host run (1 = single process)")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's rank in the multi-host run")
    p.add_argument("--mesh", action="store_true",
                   help="shard the frame over ALL visible devices (implied by "
                        "--num-processes > 1); height must divide the device count")
    return p


def apply_controls(renderer, controls: dict) -> None:
    """Apply a runtime-control dict to a live Renderer (the headless ImGui
    panel, DeferredRenderer.cpp:161-252).  Sun/sky values are traced inputs
    (no recompile); the remaining knobs go through Renderer.update_config
    (re-jit, like the reference's shader hot reload)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    sun = renderer.sun

    def _v3(v):
        return jnp.asarray([float(x) for x in v], jnp.float32)

    if "sun_dir" in controls:
        d = np.asarray([float(x) for x in controls["sun_dir"]], np.float32)
        sun = sun.replace(direction=jnp.asarray(d / np.linalg.norm(d)))
    if "sun_radiance" in controls:
        sun = sun.replace(radiance=_v3(controls["sun_radiance"]))
    if "sun_angle_deg" in controls:
        sun = sun.replace(
            tan_half_angle=jnp.float32(np.tan(np.deg2rad(float(controls["sun_angle_deg"])) * 0.5))
        )
    if "sky_color" in controls:
        sun = sun.replace(sky_color=_v3(controls["sky_color"]))
    renderer.sun = sun

    field_of = {
        "spp": "spp", "bounces": "max_bounces", "gi": "enable_gi",
        "svgf": "enable_svgf", "svgf_alpha": "svgf_temporal_alpha",
        "nrc": "enable_nrc", "nrc_lr": "nrc_learning_rate",
        "nrc_train_iterations": "nrc_train_iterations",
        "throughput_threshold": "throughput_threshold",
    }
    updates = {f: controls[k] for k, f in field_of.items() if k in controls}
    if updates:
        renderer.update_config(dataclasses.replace(renderer.cfg, **updates))


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)

    import os

    import jax

    # The tunneled TPU plugin in some images ignores JAX_PLATFORMS=cpu from
    # the environment (and its init can block on a busy tunnel); honor the
    # env var explicitly so CPU runs never touch the chip.
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    # Multi-host bring-up must precede any device use.
    distributed = args.num_processes > 1 or args.mesh
    if args.num_processes > 1:
        from nebulae_tpu.dist.mesh import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    is_host0 = jax.process_index() == 0

    from nebulae_tpu.config import RenderConfig
    from nebulae_tpu.core.camera import OrbitCamera
    from nebulae_tpu.core.scene import load_scene
    from nebulae_tpu.engine.renderer import Renderer
    from nebulae_tpu.utils.display import FrameWriter
    from nebulae_tpu.utils.logging import log_info
    from nebulae_tpu.utils.profiling import FrameTimer, profile_trace

    log_info(f"devices: {jax.devices()}")
    log_info(f"loading {args.scene}")
    scene = load_scene(args.scene, max_texture_dim=args.max_texture_dim)
    fs = scene.flat
    log_info(f"scene: {fs.num_triangles} tris, {fs.num_materials} materials, "
             f"{fs.textures.shape[0]} textures")

    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        spp=args.spp,
        max_bounces=args.bounces,
        enable_gi=not args.no_gi,
        enable_svgf=not args.no_svgf,
        enable_nrc=args.nrc,
        enable_envmap=args.envmap is not None,
        tracer=args.tracer,
        throughput_threshold=args.throughput_threshold,
        svgf_temporal_alpha=args.svgf_alpha,
        nrc_learning_rate=args.nrc_lr,
        fast_bounce_shading=args.fast_bounce_shading,
        texture_mips=not args.no_texture_mips,
        nrc_learn_irradiance=not args.nrc_raw_radiance,
        bvh_wide=args.bvh_wide,
        chunk_mode=args.chunk_mode,
        bucket_scheduling=args.bucket_scheduling,
    )

    def _vec3(s):
        v = np.asarray([float(x) for x in s.split(",")], np.float32)
        assert v.shape == (3,), s
        return v

    from nebulae_tpu.config import SunLight

    sun = SunLight.default(np)
    if args.sun_dir:
        d = _vec3(args.sun_dir)
        sun = sun.replace(direction=d / np.linalg.norm(d))
    if args.sun_radiance:
        sun = sun.replace(radiance=_vec3(args.sun_radiance))
    if args.sun_angle_deg is not None:
        sun = sun.replace(
            tan_half_angle=np.float32(np.tan(np.deg2rad(args.sun_angle_deg) * 0.5))
        )
    if args.sky_color:
        sun = sun.replace(sky_color=_vec3(args.sky_color))
    if distributed:
        from nebulae_tpu.dist.runner import DistRenderer

        renderer = DistRenderer(fs, cfg, sun=sun)
        log_info(
            f"mesh: {renderer.mesh.devices.size} devices / "
            f"{jax.process_count()} processes (rays axis)"
        )
    else:
        renderer = Renderer(fs, cfg, sun=sun)
    if args.nrc:
        # Startup memory accounting, like the reference's NRC footprint query
        # (NvRtxgiNRC.cpp:160-164 logged via its memory-events callback).
        from nebulae_tpu.nrc.cache import memory_footprint

        fp = memory_footprint(renderer.state["nrc"])
        log_info(
            "nrc cache footprint: "
            + ", ".join(f"{k} {v / 1024:.1f} KiB" for k, v in fp.items())
        )
    if args.envmap:
        import jax.numpy as jnp

        if args.envmap == "procedural":
            th = np.linspace(0, np.pi, 64, dtype=np.float32)[:, None]
            up = np.clip(np.cos(th), 0, 1)
            env = np.zeros((64, 128, 3), np.float32)
            env[..., 0] = 0.9 - 0.55 * up
            env[..., 1] = 0.55 + 0.05 * up
            env[..., 2] = 0.35 + 0.55 * up
        else:
            from PIL import Image

            from nebulae_tpu.core.texture import srgb_to_linear

            img = np.asarray(Image.open(args.envmap).convert("RGB"), np.float32) / 255.0
            env = srgb_to_linear(img).astype(np.float32)
        if distributed:
            from nebulae_tpu.dist.mesh import replicated

            renderer.scene["env_map"] = jax.device_put(
                jnp.asarray(env), replicated(renderer.mesh)
            )
        else:
            renderer.scene["env_map"] = jnp.asarray(env)
    if args.resume:
        from nebulae_tpu.utils.checkpoint import load_checkpoint

        if distributed:
            # Checkpoints store one global host snapshot; every process
            # restores it and re-shards onto the mesh.
            from nebulae_tpu.dist.mesh import shard_frame_state
            from nebulae_tpu.dist.runner import gather_state

            host_state = load_checkpoint(args.resume, gather_state(renderer.state))
            renderer.state = jax.tree.map(
                lambda x, s: jax.device_put(x, s),
                host_state,
                shard_frame_state(renderer.mesh, host_state),
            )
        else:
            renderer.state = load_checkpoint(args.resume, renderer.state)
        log_info(f"resumed state from {args.resume}")

    lo, hi = fs.aabb_min, fs.aabb_max
    center = (lo + hi) * 0.5
    cam = OrbitCamera(
        distance=args.distance_scale * float(np.max(hi - lo)),
        pitch_deg=20.0,
        yaw_deg=45.0,
        target=center,
    )
    writer = FrameWriter(args.out)
    timer = FrameTimer()
    preview = None
    if args.preview is not None and is_host0:
        from nebulae_tpu.utils.display import PreviewServer

        preview = PreviewServer(port=args.preview)
        log_info(f"live preview: http://127.0.0.1:{preview.port}/")

    # Failure detection (Nsight Aftermath analogue, SURVEY.md section 5): any
    # uncaught exception or hard crash snapshots the frame state + metadata.
    from nebulae_tpu.utils import crashdump
    from nebulae_tpu.utils.crashdump import Heartbeat
    from nebulae_tpu.utils.metrics import MetricsLogger

    crashdump.install(state_provider=lambda: renderer.state, dump_dir=args.crash_dir)
    # Per-host observability: ranks > 0 get suffixed metric/heartbeat files
    # so a pod run leaves one liveness + metrics stream per host.
    rank_sfx = "" if is_host0 else f".r{jax.process_index()}"
    metrics_path = args.metrics or str(Path(args.out) / f"metrics{rank_sfx}.jsonl")
    metrics = MetricsLogger(None if metrics_path == "off" else metrics_path)
    heartbeat = Heartbeat(args.heartbeat or Path(args.out) / f"heartbeat{rank_sfx}")

    import time as _time

    base_tri_pos = np.asarray(fs.tri_pos) if args.animate else None
    ctrl_state = {"mtime": 0.0}
    accum_state: dict = {}

    def poll_controls():
        if not args.control_file:
            return
        import json

        try:
            mtime = Path(args.control_file).stat().st_mtime
        except OSError:
            return
        if mtime <= ctrl_state["mtime"]:
            return
        ctrl_state["mtime"] = mtime
        try:
            controls = json.loads(Path(args.control_file).read_text())
        except (OSError, ValueError) as e:
            log_info(f"control file unreadable: {e}")
            return
        apply_controls(renderer, controls)
        log_info(f"applied runtime controls: {sorted(controls)}")

    def loop():
        for i in range(args.frames):
            poll_controls()
            if args.orbit_speed:
                cam.rotate(args.orbit_speed, 0.0)
                # (history handling is automatic: reprojection warps it, or
                # the renderer resets it when reprojection is off)
            if args.animate:
                # Rigid vertical bob inside the build-time AABB: per-frame
                # BVH refit + table repack on device (TLAS-update analogue).
                phase = 2.0 * np.pi * i / max(args.frames, 1)
                off = np.array(
                    [0.0, args.animate * float(hi[1] - lo[1]) * np.sin(phase), 0.0],
                    np.float32,
                )
                renderer.update_geometry(base_tri_pos + off)
            t0 = _time.perf_counter()
            out = renderer.render(cam.camera())
            if args.accumulate:
                # Progressive still: average raw (pre-denoise) HDR -- each
                # frame's RNG stream differs, so the average converges to
                # the unbiased estimate; tonemap once after the loop.
                acc = accum_state.get("hdr")
                accum_state["hdr"] = out["hdr"] if acc is None else acc + out["hdr"]
            elif distributed:
                # Host-0 present: gather the row-sharded LDR over DCN; only
                # process 0 touches the output directory.
                from nebulae_tpu.dist.runner import present_gather

                ldr_np = present_gather(out["ldr"])
                if is_host0:
                    writer.present(ldr_np)
                    if preview is not None:
                        preview.update(ldr_np)
            else:
                writer.present(out["ldr"])
                if preview is not None:
                    preview.update(out["ldr"])
            timer.tick()
            heartbeat.touch()
            metrics.scalar("frame_ms", (_time.perf_counter() - t0) * 1e3)
            if args.nrc:
                metrics.scalar("nrc_loss", float(out["nrc_loss"]))
                metrics.scalar("nrc_query_frac", float(out["nrc_query_frac"]))
            metrics.count("frames")
            metrics.flush(step=i)
            if args.checkpoint_dir and (i + 1) % args.checkpoint_every == 0:
                from nebulae_tpu.utils.checkpoint import save_checkpoint

                if distributed:
                    # One consistent global snapshot: every process gathers
                    # (collective), then EVERY process enters the orbax save
                    # -- orbax synchronizes multihost saves with global
                    # barriers internally, so a host-0-only call deadlocks
                    # the cluster (caught by the kill/resume test); the
                    # primary host does the actual writing.
                    from nebulae_tpu.dist.runner import gather_state

                    host_state = gather_state(renderer.state)
                    save_checkpoint(args.checkpoint_dir, host_state, step=i + 1)
                else:
                    save_checkpoint(args.checkpoint_dir, renderer.state, step=i + 1)

    if args.profile:
        with profile_trace(args.profile):
            loop()
    else:
        loop()
    if args.accumulate and "hdr" in accum_state:
        from nebulae_tpu.passes.tonemap import aces_tonemap

        mean_hdr = accum_state["hdr"] / args.frames
        writer.present(aces_tonemap(mean_hdr))
        writer.flush()
        log_info(f"wrote 1 accumulated still ({args.frames} frames) to {args.out}")
    else:
        writer.flush()
        log_info(f"wrote {args.frames} frames to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
