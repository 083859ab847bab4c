#!/usr/bin/env python
"""Device-trace decomposition of one render_pass.

Runs one (warm) 1M-ray pass under jax.profiler, parses the Perfetto
trace json, and prints per-op device time grouped by HLO fusion/custom-
call name — the ground truth for where a pass's ~900 ms goes.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import shutil

import jax
import jax.numpy as jnp


def run_traced(trace_dir, n, overrides):
    import dataclasses

    from rayn_tpu.config import RenderSettings
    from rayn_tpu.ops import filters as filter_ops
    from rayn_tpu.render import film as film_mod
    from rayn_tpu.render import renderer
    from rayn_tpu.scene import presets
    from rayn_tpu.utils import profiling, rng

    res = (512, 512)
    settings = RenderSettings(resolution=res, spp=128, rays_per_pass=n)
    if overrides:
        settings = dataclasses.replace(settings, **overrides)
    data, static, camera = presets.default_scene(resolution=res)
    tables = rng.build_sample_tables(settings, frame=1)
    fis = filter_ops.build_fis_table(filter_ops.blackman_harris(1.5),
                                     settings.filter_table_size)
    film = film_mod.new_film(res[0] * res[1])
    t0c, t1c = jnp.float32(1 / 24), jnp.float32(2 / 24)
    # warm/compile
    film = renderer.render_pass(film, data, static, settings, tables,
                                camera, fis, jnp.int32(0), n, t0c, t1c)
    float(film.samples[-1])
    with profiling.device_trace(trace_dir):
        film = renderer.render_pass(film, data, static, settings, tables,
                                    camera, fis, jnp.int32(n), n, t0c, t1c)
        float(film.samples[-1])


def decompose(trace_dir, top):
    paths = glob.glob(os.path.join(trace_dir,
                                   "plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace json under {trace_dir}"
    with gzip.open(sorted(paths)[-1]) as f:
        t = json.load(f)
    events = t["traceEvents"]
    # device-side complete events (TensorCore pid rows)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    device_pids = {p for p, name in pid_names.items()
                   if "TPU" in name or "/device" in name.lower()}
    by_name = collections.defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_name[name] += dur
        total += dur
    print(f"total device time: {total:.1f} ms "
          f"({len(by_name)} distinct ops)")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:8.2f} ms  {ms/total*100:5.1f}%  {name[:100]}")
    return by_name, total


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/rayn_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace-dir", default="/tmp/rayn_trace2")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("overrides", nargs="*",
                    help="RenderSettings overrides as key=value")
    args = ap.parse_args()

    if not args.parse_only:
        from rayn_tpu.config import RenderSettings
        overrides = {}
        for kv in args.overrides:
            k, v = kv.split("=", 1)
            field = RenderSettings.__dataclass_fields__[k]
            overrides[k] = type(field.default)(v)
        shutil.rmtree(args.trace_dir, ignore_errors=True)
        run_traced(args.trace_dir, args.n, overrides)
    decompose(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
