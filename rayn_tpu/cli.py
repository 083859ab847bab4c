"""Command-line renderer — the analog of the reference binary's `main`
(reference src/main.rs:28-98): build the scene, loop over frames with a
24 fps / (1/24)s-shutter schedule, render, print timing, save PNG
channels. Unlike the reference's compile-time constants (src/setup.rs),
everything is a flag.

    python -m rayn_tpu --scene fractal --width 1280 --height 720 \
        --spp 8 --frames 1 2 --out renders
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rayn_tpu", description=__doc__)
    p.add_argument("--scene", choices=("fractal", "spheres"),
                   default="fractal")
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--spp", type=int, default=8,
                   help="effective samples per pixel (reference default: "
                        "SAMPLES=2 x 4 lanes = 8)")
    p.add_argument("--bounces", type=int, default=3)
    p.add_argument("--volume-marches", type=int, default=2)
    p.add_argument("--no-volume", action="store_true")
    p.add_argument("--animated", action="store_true",
                   help="animate the camera over the shutter interval")
    p.add_argument("--frames", type=int, nargs=2, default=(1, 2),
                   metavar=("START", "END"),
                   help="frame range [start, end) (reference: 1..2)")
    p.add_argument("--frame-rate", type=float, default=24.0)
    p.add_argument("--shutter", type=float, default=1.0 / 24.0)
    p.add_argument("--filter", default="blackman_harris",
                   choices=("blackman_harris", "mitchell_netravali", "box",
                            "lanczos_sinc"))
    p.add_argument("--filter-radius", type=float, default=1.5)
    p.add_argument("--sampler", choices=("rd", "hash"), default="rd")
    p.add_argument("--out", default="renders")
    p.add_argument("--channels", nargs="+",
                   default=("alpha", "normal", "color"),
                   choices=("color", "alpha", "normal", "background"))
    p.add_argument("--aov", action="append", default=[],
                   choices=("depth", "position", "albedo", "mat_id"),
                   help="extra AOV channels (render/aovs.py registry), "
                        "accumulated at depth 0 and saved alongside "
                        "--channels")
    p.add_argument("--transparent-background", action="store_true")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint file for preemptible rendering")
    p.add_argument("--retries", type=int, default=0,
                   help="retry a failed frame this many times; with "
                        "--checkpoint each retry resumes at the last "
                        "persisted pass (failure detection + elastic "
                        "resume)")
    p.add_argument("--rays-per-pass", type=int, default=1 << 20)
    p.add_argument("--max-marches", type=int, default=256)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--trace-dir", default=None,
                   help="capture a jax.profiler device trace here")
    p.add_argument("--multichip", action="store_true",
                   help="shard the render over all visible devices")
    p.add_argument("--multichip-mode", choices=("auto", "rays", "frames"),
                   default="auto",
                   help="with --multichip: 'rays' shards each frame's "
                        "wavefront across chips; 'frames' deals whole "
                        "frames out one-per-chip (BASELINE config #5); "
                        "'auto' picks frames when rendering 2+ frames")
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address "
                        "(host:port) for the multi-process frame farm")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total process count of the frame farm; frames "
                        "are dealt round-robin across processes (DCN "
                        "stays out of the pixel path entirely)")
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--mis", action="store_true",
                   help="MIS-weight paired light/emissive emitters "
                        "(removes the reference's co-located double "
                        "count; default off = reference-faithful)")
    p.add_argument("--relax", type=float, default=1.0,
                   help="sphere-trace over-relaxation factor")
    # --- camera (reference offers these in code, src/camera.rs:120-285) ---
    p.add_argument("--camera", choices=("pinhole", "thinlens", "ortho"),
                   default="pinhole")
    p.add_argument("--fov", type=float, default=60.0,
                   help="vertical field of view in degrees (pinhole/"
                        "thinlens; reference default 60)")
    p.add_argument("--aperture", type=float, default=0.05,
                   help="thin-lens aperture radius (depth of field)")
    p.add_argument("--focus", type=float, nargs=3, default=None,
                   metavar=("X", "Y", "Z"),
                   help="thin-lens focus point (default: the look-at "
                        "point)")
    p.add_argument("--ortho-height", type=float, default=4.0,
                   help="orthographic view height in world units")
    p.add_argument("--animated-geo", action="store_true",
                   help="fractal scene with orbiting sphere lights "
                        "(multi-knot geometry channels; runs fully "
                        "fused at any knot count)")
    p.add_argument("--no-shadow-bv-clip", action="store_true",
                   help="disable the exact bounding-sphere clipping of "
                        "SDF shadow segments (BASELINE.md round-3)")
    p.add_argument("--shadow-de-iterations", type=int, default=0,
                   help="truncated-iteration DE for shadow marches "
                        "(0 = full; measured fidelity-NEGATIVE for the "
                        "MandelBox — see BASELINE.md before using)")
    p.add_argument("--no-chained-shadow", action="store_true",
                   help="march each shadow segment in its own loop "
                        "instead of chaining a ray's segments through "
                        "one (bit-identical either way; chained is the "
                        "faster default — see chained_shadow_march)")
    p.add_argument("--no-sorted-shadow", action="store_true",
                   help="disable the cost-sorted chunk scheduling of "
                        "the chained shadow march (bit-identical "
                        "either way; sorted is the faster default — "
                        "see sorted_shadow_march)")
    p.add_argument("--advance-group", type=int, default=None,
                   help="chained-march advance grouping G (default: "
                        "config chained_advance_group; 1 = refresh "
                        "every iteration)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import os as _os
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      _os.environ.get("RAYN_JAX_CACHE",
                                      "/tmp/rayn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    if args.num_processes and args.num_processes > 1:
        # Must run before anything touches the XLA backend (scene
        # building below creates device arrays).
        from rayn_tpu.parallel import distributed
        distributed.init(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)
    from rayn_tpu.config import RenderSettings
    from rayn_tpu.ops import filters as filter_ops
    from rayn_tpu.render import film as film_mod
    from rayn_tpu.render import renderer
    from rayn_tpu.scene import presets
    from rayn_tpu.utils.profiling import device_trace

    res = (args.width, args.height)
    settings = RenderSettings(
        resolution=res, spp=args.spp, max_bounces=args.bounces,
        volume_marches=args.volume_marches, sampler=args.sampler,
        rays_per_pass=args.rays_per_pass, max_marches=args.max_marches,
        use_pallas=not args.no_pallas, mis=args.mis,
        march_relaxation=args.relax,
        shadow_bv_clip=not args.no_shadow_bv_clip,
        shadow_de_iterations=args.shadow_de_iterations,
        chained_shadow_march=not args.no_chained_shadow,
        sorted_shadow_march=not args.no_sorted_shadow,
        extra_aovs=tuple(args.aov))
    if args.advance_group is not None:
        import dataclasses as _dc
        settings = _dc.replace(settings,
                               chained_advance_group=args.advance_group)

    if args.scene == "fractal":
        data, static, camera = presets.default_scene(
            resolution=res, volume=not args.no_volume,
            animated=args.animated, animated_geo=args.animated_geo)
    else:
        data, static, camera = presets.spheres_scene(resolution=res)

    if args.camera != "pinhole":
        # Rebuild the camera kind around the preset's (possibly
        # animated) origin/look-at/up channels.
        from rayn_tpu.render.camera import (OrthographicCamera,
                                            ThinLensCamera)
        if args.camera == "thinlens":
            focus = tuple(args.focus) if args.focus else camera.at
            camera = ThinLensCamera.make(
                res, args.fov, args.aperture, camera.origin, camera.at,
                camera.up, focus)
        else:
            camera = OrthographicCamera.make(
                res, args.ortho_height, camera.origin, camera.at,
                camera.up)
    elif args.fov != 60.0:
        from rayn_tpu.render.camera import PinholeCamera
        camera = PinholeCamera.make(res, args.fov, camera.origin,
                                    camera.at, camera.up)

    filt = filter_ops.FILTERS[args.filter](args.filter_radius)

    def progress(done, total):
        pct = 100.0 * done / total
        print(f"\r  {done}/{total} rays ({pct:5.1f}%)", end="",
              flush=True, file=sys.stderr)

    import contextlib
    trace_cm = (device_trace(args.trace_dir) if args.trace_dir
                else contextlib.nullcontext())

    frame_list = list(range(args.frames[0], args.frames[1]))

    def save_frame(frame, film, secs):
        n_samples = res[0] * res[1] * args.spp
        print(f"\nFrame {frame}: done in {secs:.2f}s "
              f"({n_samples / secs / 1e6:.3f} Msamples/s)",
              file=sys.stderr)
        resolved = film_mod.resolve(film, res, settings)
        paths = film_mod.save_channels(
            resolved, args.out, f"frame{frame:04d}_{args.spp}spp",
            tuple(args.channels) + tuple(args.aov),
            transparent_background=args.transparent_background)
        for p in paths:
            print(f"Saved {p}", file=sys.stderr)


    if args.num_processes and args.num_processes > 1:
        # Multi-process frame farm: this process renders its round-robin
        # share and saves its own PNGs (rayn_tpu.parallel.distributed;
        # jax.distributed was initialized at the top of main).
        from rayn_tpu.parallel import distributed
        with trace_cm:
            start = time.perf_counter()
            out = distributed.render_frames_multiprocess(
                data, static, settings, camera, frame_list,
                per_chip=args.multichip, filter=filt,
                frame_rate=args.frame_rate, shutter_speed=args.shutter)
            secs = time.perf_counter() - start
            for frame, film in out:
                save_frame(frame, film, secs / max(1, len(out)))
        return 0

    use_frame_chips = args.multichip and (
        args.multichip_mode == "frames"
        or (args.multichip_mode == "auto" and len(frame_list) >= 2))

    if use_frame_chips:
        from rayn_tpu.parallel import sharding
        with trace_cm:
            start = time.perf_counter()
            films = sharding.render_frames_per_chip(
                data, static, settings, camera, frame_list, filter=filt,
                frame_rate=args.frame_rate, shutter_speed=args.shutter)
            secs = time.perf_counter() - start
            for frame, film in zip(frame_list, films):
                save_frame(frame, film, secs / len(frame_list))
        return 0

    with trace_cm:
        for frame in frame_list:
            start = time.perf_counter()
            t0 = frame / args.frame_rate
            if args.multichip:
                from rayn_tpu.parallel import sharding
                film = sharding.render_frame_sharded(
                    data, static, settings, camera, frame=frame,
                    time_range=(t0, t0 + args.shutter), filter=filt)
            else:
                film = renderer.render_frame_resilient(
                    data, static, settings, camera, frame=frame,
                    retries=args.retries,
                    time_range=(t0, t0 + args.shutter), filter=filt,
                    checkpoint_path=args.checkpoint, progress=progress)
            jax.block_until_ready(film)
            float(film.samples[-1])  # forced sync (see bench.py)
            save_frame(frame, film, time.perf_counter() - start)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
