#!/usr/bin/env python
"""VPU roofline for the shadow march (round-4 verdict item 3).

Round 3 claimed the shadow march "runs dense DE arithmetic near the
VPU's measured per-step floor" without stating a number. This measures
the three throughputs that settle it, all on the live chip:

  1. VPU peak:   a Pallas while loop of unrolled independent fma chains
                 (the op mix the DE is made of) — measured vector
                 f32 ops/s. An fma counts as ONE op (one VPU issue);
                 multiply the ops/s by 2 for a marketing-FLOPs number.
  2. pure DE:    the same loop shape evaluating one 12-iteration
                 MandelBox DE per iteration (data-dependent chain, no
                 march logic) — DE evals/s, converted to ops/s with the
                 static op count below.
  3. real march: march_occlusion on REAL captured shadow queues; DE
                 evals actually executed = sum over Pallas blocks of
                 (block iterations x block lanes), with block
                 iterations replayed per-lane on host
                 (tools/perf_chained_predict.occlusion_steps).

utilization(DE)    = ops/s(2) / ops/s(1)   — how VPU-bound the DE is
efficiency(march)  = evals/s(3) / evals/s(2) — scheduling + bookkeeping
utilization(total) = product — the number the 47x ceiling argument
                     rests on.

MandelBox DE static op count (ops/sdf.py fn_c, counting each VPU issue
as 1 op, with mul+add pairs folded to fma where the compiler provably
can — div/sqrt optimistically counted as 1 issue each, so utilization
numbers are LOWER bounds):
  per iteration: box fold 3x(min+max+fma)=9, r2 (mul+2 fma)=3,
  sphere-fold mul (max,div,max)=3, apply (3 mul + dr mul)=4,
  scale+offset 3 fma, dr 1 fma (negated-scale constant)  -> 23
  final: r2 3 + sqrt + abs + div -> 6
  12 iterations -> 282 ops/eval.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OPS_PER_DE = 12 * 23 + 6  # see module docstring

LANES = 128


N_CHAINS = 8


def _peak_kernel(t_iters, unroll, x_ref, o_ref):
    """8 independent fma chains, `unroll` fmas each per loop iteration
    (enough ILP that the measurement is throughput-, not latency-bound)."""
    x0 = x_ref[:]
    chains = [x0 * (1.0 + 1e-7 * k) + 0.1 * k for k in range(N_CHAINS)]

    def body(state):
        i, *ch = state
        for _ in range(unroll):
            ch = [c * (1.0 + 1e-7 * k) + (0.1 if k % 2 else -0.1)
                  for k, c in enumerate(ch)]
        return (i + 1, *ch)

    def cond(state):
        return state[0] < t_iters

    out = jax.lax.while_loop(cond, body, (jnp.int32(0), *chains))
    acc = out[1]
    for c in out[2:]:
        acc = acc + c
    o_ref[:] = acc


def _de_kernel(fn_c, t_iters, prm_ref, x_ref, y_ref, z_ref, o_ref):
    from rayn_tpu.ops.sdf import MandelBoxParams
    prm = MandelBoxParams(prm_ref[0, 0], prm_ref[0, 1], prm_ref[0, 2],
                          prm_ref[0, 3])
    x, y, z = x_ref[:], y_ref[:], z_ref[:]
    d = jnp.zeros_like(x)

    def body(state):
        i, d = state
        # data-dependent chain: next eval point nudged by last DE
        dist = fn_c(prm, x + d * 1e-6, y + d * 1e-6, z + d * 1e-6)
        return i + 1, dist

    def cond(state):
        return state[0] < t_iters

    _, d = jax.lax.while_loop(cond, body, (jnp.int32(0), d))
    o_ref[:] = d


def run_block_bench(kernel, args, rows, grid, reps=6):
    """Marginal per-call time: (reps calls) minus (1 call), both synced
    once — cancels the ~44 ms axon tunnel sync that would otherwise
    inflate short kernels (same scheme as perf_occl_insitu.timeit)."""
    vspec = pl.BlockSpec((rows, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = []
    call_args = []
    for a in args:
        if a.ndim == 2 and a.shape[0] == 1:  # SMEM const row
            in_specs.append(pl.BlockSpec(a.shape, lambda i: (0, 0),
                                         memory_space=pltpu.SMEM))
        else:
            in_specs.append(vspec)
        call_args.append(a)
    f = pl.pallas_call(
        kernel, grid=(grid,), in_specs=in_specs, out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32))
    out = f(*call_args)
    _ = float(out[0, 0])
    t0 = time.perf_counter()
    out = f(*call_args)
    _ = float(out[0, 0])
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*call_args)
    _ = float(out[0, 0])
    tk = time.perf_counter() - t0
    return max((tk - t1) / (reps - 1), 1e-9)


def main():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir", "/tmp/rayn_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--n", type=int, default=1 << 18,
                    help="capture size for the real-march leg")
    ap.add_argument("--skip-march", action="store_true")
    args = ap.parse_args()

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    rows, grid, T = args.rows, args.grid, args.iters
    lanes = rows * LANES

    # --- 1. VPU peak (fma chains) ---
    unroll = 8
    x = jnp.linspace(0.1, 0.9, rows * LANES,
                     dtype=jnp.float32).reshape(rows, LANES)
    dt = run_block_bench(functools.partial(_peak_kernel, T, unroll),
                         [x], rows, grid)
    ops = N_CHAINS * unroll * T * lanes * grid
    peak = ops / dt
    print(f"1. VPU peak (fma chains):      {peak/1e12:8.3f} Tops/s "
          f"({2*peak/1e12:.3f} 'TFLOP/s' at fma=2)", flush=True)

    # --- 2. pure DE throughput ---
    from rayn_tpu.ops import sdf
    prog = sdf.mandelbox(12, 1.0, 0.01, 1.9, -2.1)
    prm = jnp.stack([prog.params.scale, prog.params.box_l,
                     prog.params.min_rad_sq,
                     prog.params.fixed_rad_sq]).reshape(1, 4)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-3.0, 3.0, (3, rows, LANES)).astype(np.float32)
    Tde = max(T // 8, 64)
    dt = run_block_bench(
        functools.partial(_de_kernel, prog.fn_c, Tde),
        [prm, jnp.asarray(pts[0]), jnp.asarray(pts[1]),
         jnp.asarray(pts[2])], rows, grid)
    evals = Tde * lanes * grid
    de_rate = evals / dt
    de_ops = de_rate * OPS_PER_DE
    print(f"2. pure DE loop:               {de_rate/1e9:8.3f} Geval/s = "
          f"{de_ops/1e12:.3f} Tops/s -> DE utilization "
          f"{100*de_ops/peak:.1f}% of peak", flush=True)

    if args.skip_march:
        return

    # --- 3. real shadow march on captured queues ---
    from perf_occl_insitu import capture_queues, timeit
    from perf_chained_predict import occlusion_steps
    from rayn_tpu.ops import march_pallas

    queues, prog_full, settings = capture_queues(args.n)
    sprog = prog_full.reduced(settings.shadow_de_iterations)
    detail = settings.sdf_detail_scale * settings.shadow_eps_scale
    steps_cap = settings.max_vis_marches
    bv_r = 3.6
    block = args.rows * LANES

    tot_ms = 0.0
    tot_evals = 0
    for b, (start, end, active) in enumerate(queues):
        start = jax.device_put(np.asarray(start))
        end = jax.device_put(np.asarray(end))
        active = jax.device_put(np.asarray(active))
        f = jax.jit(lambda s, e, a: march_pallas.march_occlusion(
            sprog, s, e, detail, steps_cap, active=a,
            block_rows=args.rows, bound_radius=bv_r))
        dt, _ = timeit(f, start, end, active)
        # replay per-lane resolve steps; a block runs max-lane steps
        # (min 1) and evaluates the DE for all `block` lanes each step
        st = np.asarray(occlusion_steps(
            sprog, jnp.asarray(start), jnp.asarray(end), detail,
            steps_cap, active=jnp.asarray(active), bound_radius=bv_r))
        n = st.shape[0]
        pad = (-n) % block
        stp = np.pad(st, (0, pad))
        iters = np.maximum(stp.reshape(-1, block).max(axis=1), 1)
        evals = int(iters.sum()) * block
        tot_ms += dt * 1e3
        tot_evals += evals
        print(f"   bounce {b}: {dt*1e3:7.2f} ms, "
              f"{evals/1e6:.1f} M DE evals", flush=True)

    march_rate = tot_evals / (tot_ms / 1e3)
    march_ops = march_rate * OPS_PER_DE
    print(f"3. real shadow march:          {march_rate/1e9:8.3f} Geval/s = "
          f"{march_ops/1e12:.3f} Tops/s", flush=True)
    print(f"   march efficiency vs pure DE: {100*march_rate/de_rate:.1f}%",
          flush=True)
    print(f"   total VPU utilization:       {100*march_ops/peak:.1f}%",
          flush=True)


if __name__ == "__main__":
    main()
