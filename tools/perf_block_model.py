#!/usr/bin/env python
"""Model march BLOCK SIZE x sort granularity on captured queues.

Round-4 shipped chunk-128 cost-sorting with 64-row (8192-lane) Pallas
blocks. The round-4 predict tool showed per-LANE sorting would cut
bounce-1-3 shadow block-steps another 1.27-1.7x over chunk-128, but
per-lane permutation costs ~2 ms/column/M (pack/interleave bound) and
the bounce state is ~50 columns wide — unaffordable. This tool models
the cheap alternative: once the queue is chunk-sorted, SMALLER blocks
capture the sorted cost gradient (a block's max approaches its mean),
approximating per-lane scheduling with zero extra permutation cost.

Reports lane-iterations (block_size x sum of per-block maxima — the
device-work unit comparable across block sizes) for the cross product
of block rows x ordering, for BOTH the chained shadow march (73% of
the shipped pass, tools/perf_trace.py round-5) and the primary
closest-hit march (20%). Runs on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/perf_block_model.py
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)
sys.path.insert(0, os.path.join(root, "tools"))


def capture_primary(n):
    """Capture closest_hit inputs (and the sphere-bounded t_max the
    fused kernel would march with) at every depth of an unfused pass."""
    from rayn_tpu.config import RenderSettings
    from rayn_tpu.ops import filters as filter_ops
    from rayn_tpu.ops import intersect
    from rayn_tpu.render import film as film_mod
    from rayn_tpu.render import renderer
    from rayn_tpu.scene import presets
    from rayn_tpu.utils import rng

    res = (512, 512)
    settings = RenderSettings(resolution=res, spp=128, rays_per_pass=n,
                              use_fused_shadows=False,
                              use_fused_finish=False,
                              use_fused_bounce_tail=False,
                              use_fused_intersect=False,
                              use_pallas=False,
                              use_pallas_occlusion=False)
    data, static, camera = presets.default_scene(resolution=res)
    tables = rng.build_sample_tables(settings, frame=1)
    fis = filter_ops.build_fis_table(filter_ops.blackman_harris(1.5),
                                     settings.filter_table_size)

    captured = []
    real = intersect.closest_hit

    def spy(data_, static_, settings_, origin, direction, time_, t_max,
            hps_abs, hps_lin, active):
        captured.append((origin, direction, time_, t_max, hps_abs,
                         hps_lin, active))
        return real(data_, static_, settings_, origin, direction, time_,
                    t_max, hps_abs, hps_lin, active)

    intersect.closest_hit = spy
    try:
        from rayn_tpu.render.integrator import init_state, trace
        ray_idx = renderer.ray_indices(jnp.int32(0), n)
        origin, direction, tm, pixel, sample_idx, in_range = \
            renderer.generate_rays(settings, tables, camera, fis, ray_idx,
                                   jnp.float32(1 / 24), jnp.float32(2 / 24))
        hps_abs0, hps_lin0 = camera.half_pixel_size_coeffs()
        state = init_state(origin, direction, tm, pixel, sample_idx,
                           in_range)
        trace(data, static, settings, tables, state, hps_abs0, hps_lin0)
    finally:
        intersect.closest_hit = real
    prog = static.sdf_program(data)
    return captured, data, static, prog, settings


def primary_steps(prog, settings, data, static, origin, direction, time_,
                  hps_abs, hps_lin, active):
    """Per-lane step count of the fused intersect kernel's SDF march
    (sphere fold bounds t_max first — ops/intersect_pallas.py), plus the
    first-DE t0 the pre-march sort key can see."""
    from rayn_tpu.ops import spheres as sphere_ops
    from rayn_tpu.scene.scene import sphere_centers_at

    t_max0 = 2.0 * settings.world_radius
    centers = sphere_centers_at(data, time_)
    ts = sphere_ops.hit(origin, direction, centers, data.sphere_radii,
                        jnp.full(origin.shape[:1], t_max0, jnp.float32))
    best_t = jnp.minimum(jnp.min(ts, axis=1), t_max0)

    detail = settings.sdf_detail_scale
    eps_const = 5e-5 * detail
    eps_abs = 0.05 * detail * hps_abs
    eps_lin = 0.05 * detail * hps_lin

    t0 = prog.dist(origin)
    nan_mask = jnp.isnan(t0) & active
    t0 = jnp.where(active, t0, best_t + 1.0)

    def body(_, state):
        t, steps, resolved = state
        dist = prog.dist(origin + t[:, None] * direction)
        thresh = jnp.maximum(eps_const, eps_abs + eps_lin * t)
        done = (jnp.abs(dist) < thresh) | nan_mask | (t > best_t)
        steps = jnp.where(resolved, steps, steps + 1)
        resolved = resolved | done
        t = jnp.where(done, t, t + dist)
        return t, steps, resolved

    # the kernel body evaluates one DE per iteration including the
    # resolving one; entry-done lanes still burn their first iteration
    _, steps, _ = jax.lax.fori_loop(
        0, settings.max_marches, body,
        (t0, jnp.zeros_like(t0, jnp.int32),
         jnp.zeros_like(nan_mask)))
    return steps, t0, best_t


def block_cost(totals, order, B):
    """Lane-iterations: B * sum over B-lane blocks of the block max."""
    t = totals[order] if order is not None else totals
    pad = (-len(t)) % B
    if pad:
        t = np.pad(t, (0, pad))
    return int(t.reshape(-1, B).max(axis=1).sum()) * B


def chunk_order(key, chunk):
    nch = len(key) // chunk
    ckey = key[:nch * chunk].reshape(nch, chunk).sum(axis=1)
    corder = np.argsort(-ckey, kind="stable")
    return (corder[:, None] * chunk
            + np.arange(chunk)[None, :]).reshape(-1)


def two_tier_order(key, chunk, head_frac, fine_key=None):
    """Chunk-sort globally, then PER-LANE sort the head `head_frac` of
    the queue by `fine_key` (defaults to `key`). The per-lane gather is
    affordable because it touches only the head slice (contiguous after
    the chunk permutation): ~2 ms/column/M * head_frac vs the full
    per-lane 95 ms/M pathology (tools/perf_sorted_decomp.py)."""
    order = chunk_order(key, chunk)
    fk = key if fine_key is None else fine_key
    h = int(len(order) * head_frac)
    head = order[:h]
    head = head[np.argsort(-fk[head], kind="stable")]
    return np.concatenate([head, order[h:]])


def recirc_cost(totals, order, B, cap):
    """Capped phase 1 + dense straggler recirculation: every block
    marches at most `cap` chained iterations (blocks that finish
    earlier exit at their max as today); lanes with more remaining work
    are compacted densely (queue order) and finished in a second
    kernel. Returns (lane-iterations phase1+phase2, straggler_frac)."""
    t = totals[order] if order is not None else totals
    pad = (-len(t)) % B
    if pad:
        t = np.pad(t, (0, pad))
    blocks = t.reshape(-1, B)
    cost1 = int(np.minimum(blocks.max(axis=1), cap).sum()) * B
    resid = t - cap
    strag = resid[resid > 0]
    if len(strag):
        pad2 = (-len(strag)) % B
        strag = np.pad(strag, (0, pad2))
        cost2 = int(strag.reshape(-1, B).max(axis=1).sum()) * B
    else:
        cost2 = 0
    return cost1 + cost2, len(strag) / len(t)


def probe_report(steps2d, B=8192, chunk=128, caps=(2, 4, 8, 12, 16)):
    """Probe + informed re-sort + resume: phase 1 marches every
    segment up to C steps in queue (pixel-major) order — this runs in
    the sort-KEY kernel, so its DE evals REPLACE march steps instead of
    adding to them — and outputs per-segment resume t. Phase 2 (the
    mega kernel) marches only the residual steps, chunk-sorted by a
    POST-probe key. Two key qualities bracket reality: the TRUE
    residual (a post-probe DE-informed estimate approaches this — an
    unresolved-at-C segment's current DE and remaining length are
    visible to the probe) and the crude unresolved-segment COUNT."""
    for C in caps:
        p = np.minimum(steps2d, C).sum(axis=0).astype(np.int64)
        r = np.maximum(steps2d - C, 0).sum(axis=0).astype(np.int64)
        c_probe = block_cost(p, None, B)
        c2_true = block_cost(r, chunk_order(r.astype(np.float64), chunk),
                             B)
        unres = (steps2d > C).sum(axis=0).astype(np.float64)
        c2_cnt = block_cost(r, chunk_order(unres, chunk), B)
        print(f"    probeC{C:<2d}: probe {c_probe/1e6:6.2f} + "
              f"p2true {c2_true/1e6:6.2f} = {(c_probe+c2_true)/1e6:6.2f}"
              f" | p2cnt tot {(c_probe+c2_cnt)/1e6:6.2f}"
              f" (resid lanes {100*(r>0).mean():.0f}%)")


def report(name, totals, key, blocks, chunks):
    """Grid: rows = ordering, cols = block rows. Cells = lane-Miters."""
    n = len(totals)
    orders = [("unsorted", None)]
    for c in chunks:
        if n % c == 0:
            orders.append((f"chunk{c}", chunk_order(key, c)))
    for hf in (0.125, 0.25, 0.5):
        orders.append((f"2tier/{hf}", two_tier_order(key, 128, hf)))
    orders.append(("2tierOrcl", two_tier_order(key, 128, 0.25,
                                               fine_key=totals)))
    orders.append(("perlane", np.argsort(-key, kind="stable")))
    orders.append(("oracle", np.argsort(-totals, kind="stable")))
    print(f"  {name}: lane-Miters (block rows x ordering)")
    hdr = "    {:10s}".format("") + "".join(
        f"{f'rows={b//128}':>12s}" for b in blocks)
    print(hdr)
    for oname, order in orders:
        row = f"    {oname:10s}"
        for B in blocks:
            row += f"{block_cost(totals, order, B)/1e6:12.2f}"
        print(row)
    # capped phase-1 + dense straggler recirculation, on the shipped
    # chunk-128 order at the shipped 8192-lane blocks
    c128 = chunk_order(key, 128) if n % 128 == 0 else None
    row = "    recirc@64r "
    for cap in (8, 12, 16, 24, 32, 48):
        cost, frac = recirc_cost(totals, c128, 8192, cap)
        row += f"  C{cap}:{cost/1e6:.2f}/{100*frac:.0f}%"
    print(row)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 16)
    args = ap.parse_args()
    blocks = [512, 1024, 2048, 4096, 8192]
    chunks = (8, 128, 512)

    # ---- shadow (chained) ----
    # Captured queues and step counts are cached in /tmp so model
    # iterations (new orderings/probe variants) skip the ~10 min CPU
    # capture+count.
    cache = f"/tmp/bm_cache_shadow_{args.n}.npz"
    if os.path.exists(cache):
        cached = dict(np.load(cache))
        nb = cached["n_bounces"]
        queues = [(cached[f"start{b}"], cached[f"end{b}"],
                   cached[f"active{b}"]) for b in range(nb)]
        steps_all = [cached[f"steps{b}"] for b in range(nb)]
        from rayn_tpu.config import RenderSettings
        from rayn_tpu.ops import sdf as sdf_ops
        settings = RenderSettings(resolution=(512, 512))
        prog = sdf_ops.mandelbox(iterations=12, box_fold_l=1.0,
                                 sphere_min_rad=0.01,
                                 sphere_fixed_rad=1.9, scale=-2.1)
    else:
        from perf_chained_predict import occlusion_steps
        from perf_occl_insitu import capture_queues
        queues, prog, settings = capture_queues(args.n)
        from rayn_tpu.scene import presets
        _, static0, _ = presets.default_scene(resolution=(512, 512))
        detail0 = settings.sdf_detail_scale * settings.shadow_eps_scale
        cap0 = settings.max_vis_marches
        bvr0 = (static0.sdf_bound_radius if settings.shadow_bv_clip
                else 0.0)
        count = jax.jit(lambda s, e, a: occlusion_steps(
            prog, s, e, detail0, cap0, active=a, bound_radius=bvr0))
        steps_all = []
        csave = {"n_bounces": len(queues)}
        for bi, (start, end, active) in enumerate(queues):
            k = start.shape[0] // args.n
            steps_all.append(np.asarray(
                count(start, end, active)).reshape(k, args.n))
            csave[f"steps{bi}"] = steps_all[-1]
            csave[f"start{bi}"] = np.asarray(start)
            csave[f"end{bi}"] = np.asarray(end)
            csave[f"active{bi}"] = np.asarray(active)
        np.savez(cache, **csave)
    from rayn_tpu.scene import presets
    _, static, _ = presets.default_scene(resolution=(512, 512))
    detail = settings.sdf_detail_scale * settings.shadow_eps_scale
    cap = settings.max_vis_marches
    bv_r = static.sdf_bound_radius if settings.shadow_bv_clip else 0.0

    print(f"shadow chained march, n={args.n}")
    for bi, (start, end, active) in enumerate(queues):
        k = start.shape[0] // args.n
        steps = steps_all[bi]
        totals = steps.sum(axis=0).astype(np.int64)
        # md/t0 key (the shipped shadow_sort_key estimate)
        seg = np.asarray(end) - np.asarray(start)
        md = np.sqrt((seg * seg).sum(axis=-1))
        d0 = np.asarray(prog.dist(start))
        act = np.asarray(active)
        if bv_r > 0.0:
            st = np.asarray(start)
            dseg = seg / md[:, None]
            b = (st * dseg).sum(axis=-1)
            c = (st * st).sum(axis=-1) - bv_r * bv_r
            disc = b * b - c
            sq = np.sqrt(np.maximum(disc, 0.0))
            t_exit = -b + sq
            miss = (disc <= 0.0) | (t_exit <= 0.0)
            md2 = np.minimum(md, t_exit)
            t0k = np.maximum(d0, np.maximum(-b - sq, 0.0))
        else:
            miss = np.zeros(md.shape, bool)
            md2, t0k = md, d0
        nank = np.isnan(d0) | ~act | miss
        est = np.minimum(md2 / np.maximum(t0k, 1e-6), cap)
        est = np.where(nank | (t0k > md2), 1.0, est)
        key = est.reshape(k, args.n).sum(axis=0)
        report(f"bounce {bi}", totals, key, blocks, chunks)
        probe_report(steps)

    # ---- primary march ----
    pcache = f"/tmp/bm_cache_primary_{args.n}.npz"
    if os.path.exists(pcache):
        pc = dict(np.load(pcache))
        prows = [(pc[f"totals{d}"], pc[f"key{d}"], float(pc[f"act{d}"]))
                 for d in range(pc["n_depths"])]
    else:
        prim, data, static, prog, psettings = capture_primary(args.n)
        pcount = jax.jit(lambda o, d, t, ha, hl, a: primary_steps(
            prog, psettings, data, static, o, d, t, ha, hl, a))
        prows, psave = [], {"n_depths": len(prim)}
        for di, (origin, direction, time_, t_max, hps_abs, hps_lin,
                 active) in enumerate(prim):
            steps, t0, best_t = pcount(origin, direction, time_,
                                       hps_abs, hps_lin, active)
            totals = np.asarray(steps).astype(np.int64)
            t0n = np.asarray(t0)
            bt = np.asarray(best_t)
            act = np.asarray(active)
            est = np.minimum(bt / np.maximum(t0n, 1e-6),
                             psettings.max_marches)
            key = np.where(~act | np.isnan(t0n), 1.0, est)
            prows.append((totals, key, float(act.mean())))
            psave[f"totals{di}"] = totals
            psave[f"key{di}"] = key
            psave[f"act{di}"] = act.mean()
        np.savez(pcache, **psave)
    print(f"primary march, n={args.n}")
    for di, (totals, key, actm) in enumerate(prows):
        report(f"depth {di} (active={actm:.3f})", totals, key,
               blocks, chunks)
        probe_report(totals[None, :])


if __name__ == "__main__":
    main()
