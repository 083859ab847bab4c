#!/usr/bin/env python
"""Advance-group sweep for the chained shadow march (round 4).

Round 3's chained march converted a 1.67x block-iteration reduction
into only +7% wall-clock; the implied per-iteration cost is ~1.5x a
sequential iteration, i.e. the every-iteration one-hot segment-register
refresh costs ~50% of a 12-iteration MandelBox DE. `advance_group=G`
runs the refresh under a lax.cond only every G iterations (resolved
lanes idle <= G-1; bit-identical verdicts). This times the REAL
captured shadow queues at G in {1, 2, 4, 8, 16}.

Run on the live chip:  python tools/perf_chained_group.py [--n 262144]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir", "/tmp/rayn_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 18)
    ap.add_argument("--groups", type=int, nargs="*", default=[1, 2, 4, 8, 16])
    ap.add_argument("--rows", type=int, default=64)
    args = ap.parse_args()

    from perf_occl_insitu import capture_queues, timeit
    from rayn_tpu.ops import march_pallas

    queues, prog, settings = capture_queues(args.n)
    print(f"captured {len(queues)} bounce queues", flush=True)
    # production shadow-march configuration: reduced DE + scaled eps + BV
    sprog = prog.reduced(settings.shadow_de_iterations)
    detail = settings.sdf_detail_scale * settings.shadow_eps_scale
    steps = settings.max_vis_marches
    bv_r = 3.6
    K = 12

    totals = {g: 0.0 for g in args.groups}
    for b, (start, end, active) in enumerate(queues):
        n_lanes = start.shape[0]
        if n_lanes % K:
            continue
        nseg = n_lanes // K
        s3 = jax.device_put(np.asarray(start)).reshape(K, nseg, 3)
        e3 = jax.device_put(np.asarray(end)).reshape(K, nseg, 3)
        a2 = jax.device_put(np.asarray(active)).reshape(K, nseg)
        frac = float(np.asarray(active).mean())
        ref = None
        for g in args.groups:
            f = jax.jit(lambda s, e, a, g=g:
                        march_pallas.march_occlusion_chained(
                            prog=sprog, start=s, end=e,
                            detail_scale=detail, max_steps=steps,
                            active=a, block_rows=args.rows,
                            bound_radius=bv_r, advance_group=g))
            dt, out = timeit(f, s3, e3, a2)
            out = np.asarray(out)
            if ref is None:
                ref = out
            ok = np.array_equal(out, ref)
            totals[g] += dt
            print(f"bounce {b} (active={frac:.3f}) G={g:<3d}"
                  f"{dt*1e3:8.2f} ms  match={ok}", flush=True)
    print("--- totals over all bounces ---", flush=True)
    base = totals[args.groups[0]]
    for g in args.groups:
        print(f"G={g:<3d} {totals[g]*1e3:8.2f} ms   "
              f"vs G={args.groups[0]}: {base/totals[g]:.3f}x", flush=True)


if __name__ == "__main__":
    main()
