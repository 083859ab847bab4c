#!/usr/bin/env python
"""Isolate the Pallas per-block fixed cost on v5e (round 5).

The block-rows sweep (tools/perf_blockrows_ab.py) back-solves the mega
kernel's per-block fixed cost at ~1 ms — with ~122 VMEM buffers per
block that is ~10 us per buffer DMA if the cost is DMA-issue-bound, in
which case packing the per-lane inputs into a few 3D arrays would save
~100+ ms/pass at 64 rows. This kernel isolates the question: a trivial
elementwise kernel with a configurable number of (rows, 128) inputs,
timed across block sizes at constant N. Slope vs block count = per-block
fixed cost; scaling vs input count = per-DMA cost.

Run on the live chip:  python tools/perf_dma_probe.py
"""

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_in, *refs):
    ins, outs = refs[:n_in], refs[n_in:]
    acc = ins[0][:]
    for r in ins[1:]:
        acc = acc + r[:]
    for o in outs:
        o[:] = acc


def probe(n_in, n_out, rows_total, block_rows, reps=8):
    args = [jnp.full((rows_total, 128), float(i), jnp.float32)
            for i in range(n_in)]
    vspec = pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((rows_total, 128), jnp.float32)
    grid = rows_total // block_rows

    fn = jax.jit(lambda *a: pl.pallas_call(
        functools.partial(_kernel, n_in), grid=(grid,),
        in_specs=[vspec] * n_in, out_specs=(vspec,) * n_out,
        out_shape=(f32,) * n_out)(*a))
    out = fn(*args)
    float(out[0][-1, -1])  # compile+sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(out[0][-1, -1])
    dt = (time.perf_counter() - t0) / reps
    print(f"  n_in={n_in:3d} n_out={n_out:2d} rows={block_rows:3d} "
          f"blocks={grid:5d}: {dt*1e3:8.2f} ms "
          f"({dt/grid*1e6:7.1f} us/block)", flush=True)
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("RAYN_JAX_CACHE", "/tmp/rayn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8192,
                    help="total rows (8192 = 1M lanes)")
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    for n_in, n_out in ((98, 24), (25, 24), (98, 4)):
        for block_rows in (64, 16, 8):
            probe(n_in, n_out, args.rows, block_rows)


if __name__ == "__main__":
    main()
