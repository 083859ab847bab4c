#!/usr/bin/env python
"""Predict the win of CHAINING each ray's 12 shadow segments through one
while loop, from real captured queues (no kernel work needed).

The fused shadow pipeline (ops/shade_pallas._shadow_delta) marches the
12 segments of a bounce (4 NEE + 2x4 equi-angular volume) as 12
SEQUENTIAL while loops over the same block of rays; each loop runs until
its worst lane resolves, so a block pays

    cost_seq = sum_k  max_{ray in block} steps[k, ray].

If instead each lane marched its OWN 12 segments back-to-back inside one
while loop (advancing to its next segment as each resolves), the block
would pay

    cost_chain = max_{ray in block} sum_k steps[k, ray]

which is smaller whenever per-ray straggler segments don't pile onto the
same ray — exactly what the round-2 finding "89-100% of rows contain a
straggler lane" suggests. This tool captures the real queues (same spy
as tools/perf_occl_insitu.py), counts per-lane resolve steps with a
step-counting twin of ops.march.march_occlusion, and reports both sums
per bounce. Runs fine on CPU (JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=).
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def occlusion_steps(sdf, start, end, detail_scale, max_steps,
                    active=None, bound_radius=0.0):
    """Per-lane resolve step count for ops.march.march_occlusion
    (relax=1): the number of loop iterations until the lane is done
    (hit or past-end/nan), i.e. the iterations it keeps the block alive."""
    seg = end - start
    max_dist = jnp.sqrt(jnp.sum(seg * seg, axis=-1))
    d = seg / max_dist[:, None]

    dist0 = sdf.dist(start)
    nan_mask = jnp.isnan(dist0)
    if active is not None:
        nan_mask = jnp.where(active, nan_mask, True)

    if bound_radius > 0.0:
        b = jnp.sum(start * d, axis=-1)
        c = jnp.sum(start * start, axis=-1) - bound_radius * bound_radius
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_exit = -b + sq
        bv_miss = (disc <= 0.0) | (t_exit <= 0.0)
        nan_mask = nan_mask | bv_miss
        max_dist = jnp.minimum(max_dist, t_exit)
        dist0 = jnp.maximum(dist0, jnp.maximum(-b - sq, 0.0))

    eps_c = 1e-4 * detail_scale
    eps_l = 1e-5 * detail_scale

    def body(_, state):
        t, steps, resolved = state
        gt_nan = (t > max_dist) | nan_mask
        dist = sdf.dist(start + t[:, None] * d)
        hit = jnp.abs(dist) < jnp.maximum(eps_c, eps_l * t)
        done = hit | gt_nan
        steps = jnp.where(resolved, steps, steps + 1)
        resolved = resolved | done
        t = jnp.where(done, t, t + dist)
        return t, steps, resolved

    # a lane done before its first loop-body DE (nan/bv-miss lanes enter
    # with gt_nan true) still burns one iteration in the real kernel's
    # body before `done` is observed; count it the same way here.
    t, steps, _ = jax.lax.fori_loop(
        0, max_steps, body,
        (dist0, jnp.zeros_like(dist0, jnp.int32),
         jnp.zeros_like(nan_mask)))
    return steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--block", type=int, default=8192,
                    help="lanes per Pallas block (64 rows x 128)")
    args = ap.parse_args()

    import os
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, "tools"))
    from perf_occl_insitu import capture_queues

    queues, prog, settings = capture_queues(args.n)
    from rayn_tpu.scene import presets
    _, static, _ = presets.default_scene(resolution=(512, 512))
    detail = settings.sdf_detail_scale * settings.shadow_eps_scale
    cap = settings.max_vis_marches
    bv_r = static.sdf_bound_radius if settings.shadow_bv_clip else 0.0
    print(f"captured {len(queues)} bounces, n={args.n}, "
          f"cap={cap}, bv_r={bv_r}")

    count = jax.jit(lambda s, e, a: occlusion_steps(
        prog, s, e, detail, cap, active=a, bound_radius=bv_r))

    def seg_setup(start, end, active):
        """Per-segment (t0, md, entry_resolved) as the chained core
        computes them — everything here is available BEFORE marching."""
        seg = end - start
        md = jnp.sqrt(jnp.sum(seg * seg, axis=-1))
        d = seg / md[:, None]
        dist0 = prog.dist(start)
        nan = jnp.isnan(dist0) | jnp.logical_not(active)
        t0 = dist0
        if bv_r > 0.0:
            b = jnp.sum(start * d, axis=-1)
            c = jnp.sum(start * start, axis=-1) - bv_r * bv_r
            disc = b * b - c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_exit = -b + sq
            nan = nan | (disc <= 0.0) | (t_exit <= 0.0)
            md = jnp.minimum(md, t_exit)
            t0 = jnp.maximum(dist0, jnp.maximum(-b - sq, 0.0))
        return t0, md, nan

    setup = jax.jit(seg_setup)

    def seg_two_step(start, end, active):
        """March position after exactly two loop iterations (the same
        step rule as the occlusion march), for the 2-step sort key."""
        t0, md, nan = seg_setup(start, end, active)
        seg = end - start
        d = seg / jnp.sqrt(jnp.sum(seg * seg, axis=-1))[:, None]
        eps_c, eps_l = 1e-4 * detail, 1e-5 * detail
        t = t0
        for _ in range(2):
            gt_nan = (t > md) | nan
            dist = prog.dist(start + t[:, None] * d)
            hit = jnp.abs(dist) < jnp.maximum(eps_c, eps_l * t)
            done = hit | gt_nan
            t = jnp.where(done, t, t + dist)
        return t

    two_step = jax.jit(seg_two_step)

    B = args.block
    tot_seq = tot_chain = tot_flat = 0
    prev_totals = None
    for bi, (start, end, active) in enumerate(queues):
        kn = start.shape[0]
        k = kn // args.n
        steps = np.asarray(count(start, end, active))      # [k*n]
        per_seg = steps.reshape(k, args.n)                  # [k, n]
        nblk = (args.n + B - 1) // B
        pad = nblk * B - args.n
        if pad:
            per_seg = np.pad(per_seg, ((0, 0), (0, pad)))
        blocks = per_seg.reshape(k, nblk, B)                # [k, blk, B]
        # current fused scheme: 12 sequential block-max loops
        seq = blocks.max(axis=2).sum(axis=0).sum()
        # chained scheme: one loop, block max of per-ray totals
        chain = blocks.sum(axis=0).max(axis=1).sum()
        # unfused flat batch (segment-major concat, same block size)
        flat_steps = steps
        fpad = (-len(flat_steps)) % B
        if fpad:
            flat_steps = np.pad(flat_steps, (0, fpad))
        flat = flat_steps.reshape(-1, B).max(axis=1).sum()
        act = np.asarray(active).reshape(k, args.n)
        useful = per_seg[:, :args.n][act.astype(bool)].sum()
        # headroom of SORTING rays before chaining: totals concentrate
        # (sums of 12), so ray ordering may pack blocks by cost where
        # per-segment sorting failed. Oracle = sort by the true per-ray
        # total; practical predictor = the SAME ray's total at the
        # previous bounce (the wavefront is uncompacted, so lane i is
        # the same path at every bounce).
        totals = per_seg.sum(axis=0)                        # [n+pad]
        osort = np.sort(totals)[::-1]
        oracle = osort.reshape(nblk, B).max(axis=1).sum()
        line = (f"bounce {bi}: k={k} active={act.mean():.3f} "
                f"seq={seq} chain={chain} ({seq/chain:.2f}x) "
                f"oracle-sorted={oracle} ({chain/max(oracle,1):.2f}x "
                f"more) flat={flat} useful={useful} "
                f"(seq util {useful/(seq*B):.3f}, "
                f"chain util {useful/(chain*B):.3f})")
        if prev_totals is not None:
            order = np.argsort(-prev_totals, kind="stable")
            psort = totals[order]
            prev_pred = psort.reshape(nblk, B).max(axis=1).sum()
            line += (f" prev-bounce-sorted={prev_pred} "
                     f"({chain/max(prev_pred,1):.2f}x more)")
        prev_totals = totals
        print(line)

        # --- practical same-bounce sort keys (computable pre-march) ---
        t0, md, nan = (np.asarray(x) for x in setup(start, end, active))
        t0 = t0.reshape(k, args.n)
        md = md.reshape(k, args.n)
        nan = nan.reshape(k, args.n)
        # steps-if-DE-stayed-constant, per segment, capped at the
        # per-segment budget; entry-resolved segments cost 1
        est = np.minimum(md / np.maximum(t0, 1e-6), cap)
        est = np.where(nan | (t0 > md), 1.0, est)
        # 2-step extrapolation: march two real steps, then extrapolate
        # the remaining distance at the mean step size so far (captures
        # early creep that the first DE alone misses; 2x the key DEs)
        t2 = np.asarray(two_step(start, end, active)).reshape(k, args.n)
        mean_step = np.maximum((t2 - t0) * 0.5, 1e-6)
        est2 = 2.0 + np.minimum((md - t2) / mean_step, cap - 2)
        est2 = np.where(nan | (t0 > md), 1.0,
                        np.where(t2 > md, np.minimum(est, 2.0), est2))
        live_t0 = np.where(nan, np.inf, t0)
        for name, key in (("md/t0", est.sum(axis=0)),
                          ("2-step", est2.sum(axis=0)),
                          ("min-t0", -live_t0.min(axis=0)),
                          # per-ray keys computable OUTSIDE the fused
                          # kernel: the NEE segments all start at the
                          # surface point p, so seg-0's clipped DE is
                          # ~one extra DE eval per ray
                          ("nee-t0", -live_t0[0]),
                          ("nee-est", est[:4].sum(axis=0))):
            key = np.pad(key, (0, pad)) if pad else key
            order = np.argsort(-key, kind="stable")
            cost = totals[order].reshape(nblk, B).max(axis=1).sum()
            line2 = (f"  sortkey {name}: {cost} "
                     f"({chain/max(cost,1):.2f}x over chain; oracle "
                     f"{oracle})")
            print(line2)
        # CHUNK-granular sorting (the SHIPPED scheme,
        # integrator._sort_by_cost): the md/t0 key summed per chunk of
        # adjacent lanes, chunks permuted whole. Shows how much of the
        # per-lane sort's win survives chunking — and the per-lane
        # oracle at each chunk size (sort by true totals, still
        # chunk-granular) separates key error from granularity loss.
        lane_key = est.sum(axis=0)
        lane_key = np.pad(lane_key, (0, pad)) if pad else lane_key
        for chunk in (8, 32, 128, 512):
            nch = len(lane_key) // chunk
            ckey = lane_key.reshape(nch, chunk).sum(axis=1)
            corder = np.argsort(-ckey, kind="stable")
            perm = (corder[:, None] * chunk
                    + np.arange(chunk)[None, :]).reshape(-1)
            cost = totals[perm].reshape(nblk, B).max(axis=1).sum()
            otk = totals.reshape(nch, chunk).sum(axis=1)
            oorder = np.argsort(-otk, kind="stable")
            operm = (oorder[:, None] * chunk
                     + np.arange(chunk)[None, :]).reshape(-1)
            ocost = totals[operm].reshape(nblk, B).max(axis=1).sum()
            print(f"  chunk={chunk}: md/t0-key={cost} "
                  f"({chain/max(cost,1):.2f}x over chain) "
                  f"true-key={ocost} ({chain/max(ocost,1):.2f}x)")
        # phase-1 predictor: chain with per-segment cap C, sort the
        # unresolved rays by their capped totals, finish from scratch
        # with resolved segments masked off (1 iteration each)
        for C in (8, 16):
            capped = np.minimum(per_seg, C)
            p1_lane = capped.sum(axis=0)                 # phase-1 cost
            p1 = p1_lane.reshape(nblk, B).max(axis=1).sum()
            unres = (per_seg > C) | (per_seg >= cap)     # not surely done
            any_un = unres.any(axis=0)
            p2_lane = np.where(any_un,
                               np.where(unres, per_seg, 1).sum(axis=0), 0)
            order = np.argsort(-(p1_lane + 1000000 * any_un),
                               kind="stable")
            p2 = p2_lane[order].reshape(nblk, B).max(axis=1).sum()
            print(f"  phase1 C={C}: p1={p1} p2={p2} total={p1 + p2} "
                  f"({chain/max(p1 + p2, 1):.2f}x over chain, "
                  f"unresolved rays {any_un.mean():.3f})")
        tot_seq += seq
        tot_chain += chain
        tot_flat += flat

    print(f"TOTAL block-steps: sequential={tot_seq} chained={tot_chain} "
          f"flat={tot_flat}")
    print(f"predicted chained speedup on the shadow-march loops: "
          f"{tot_seq/tot_chain:.2f}x")


if __name__ == "__main__":
    main()
