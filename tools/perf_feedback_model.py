#!/usr/bin/env python
"""Model COST-FEEDBACK RAY ORDERING on the captured queues.

Round-5 finding: every affordable permutation-based scheduling form is
priced out by TPU gather economics (perf_block_model.py — per-lane
sort of the ~50-column bounce state costs ~2 ms/column/M, eating the
modeled win), while the oracle ordering is worth 2.1x on the shadow
march. The way around the wall: don't permute the state at all —
permute the RAY -> (pixel, sample) assignment at generation time, so
the wavefront is BORN in cost order. The film splat is scatter-by-
pixel-id (position independent) and the samplers are counter functions
of (pixel, sample), so per-ray results are bit-identical; only block
membership changes.

The cost key is MEASURED, not estimated: a seed segment of S samples
per pixel renders in pixel-major order while the kernels accumulate
each lane's actual march step counts into a per-pixel film channel;
the remaining spp - S samples render with pixels assigned to lanes in
descending measured-cost order (one [n_pixels] i32 gather at raygen —
~2 ms/M — instead of any per-lane state permutation).

This tool validates the premise on the round-5 captured queues
(512x512 @128spp pass, n=65536 = 512 pixels x 128 adjacent samples):
per-pixel cost measured from samples [0, S) must schedule samples
[S, 128) of the SAME pixels near the oracle, per depth. Run:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/perf_feedback_model.py
(needs /tmp/bm_cache_*.npz from perf_block_model.py)
"""

import numpy as np

B = 8192          # shipped block lanes (64 rows)
SPP = 128         # capture layout: lane // SPP = pixel


def block_cost(totals, B=B):
    pad = (-len(totals)) % B
    if pad:
        totals = np.pad(totals, (0, pad))
    return int(totals.reshape(-1, B).max(axis=1).sum()) * B


def main():
    sh = dict(np.load("/tmp/bm_cache_shadow_65536.npz"))
    pr = dict(np.load("/tmp/bm_cache_primary_65536.npz"))
    nb = int(sh["n_bounces"])
    n = sh["steps0"].shape[1]
    npix = n // SPP

    # per-lane chained totals per bounce; per-lane primary steps per depth
    shadow = [sh[f"steps{b}"].sum(axis=0).astype(np.int64)
              for b in range(nb)]
    primary = [pr[f"totals{d}"].astype(np.int64)
               for d in range(int(pr["n_depths"]))]
    grand = sum(shadow) + sum(primary)   # per-lane full-path cost

    for S in (4, 8, 16):
        # seed cost: mean full-path cost of samples [0, S) per pixel
        seed = grand.reshape(npix, SPP)[:, :S].mean(axis=1)
        order_pix = np.argsort(-seed, kind="stable")
        # eval lanes: samples [S, 128) in born order = sorted pixels,
        # samples adjacent (the real scheme's layout)
        eval_idx = (order_pix[:, None] * SPP
                    + np.arange(S, SPP)[None, :]).reshape(-1)
        base_idx = np.arange(npix * SPP).reshape(npix, SPP)[:, S:].reshape(-1)
        print(f"seed S={S} ({100*S/SPP:.0f}% of spp):")
        for name, qs in (("shadow", shadow), ("primary", primary)):
            tot_born, tot_pm, tot_orc = 0, 0, 0
            row = []
            for d, t in enumerate(qs):
                born = block_cost(t[eval_idx])
                pm = block_cost(t[base_idx])            # pixel-major
                orc = block_cost(np.sort(t[base_idx])[::-1])
                tot_born += born
                tot_pm += pm
                tot_orc += orc
                row.append(f"d{d} {pm/1e6:.2f}->{born/1e6:.2f}"
                           f"(orc {orc/1e6:.2f})")
            print(f"  {name:8s} " + "  ".join(row))
            print(f"  {name:8s} total pixel-major {tot_pm/1e6:.2f} -> "
                  f"born-sorted {tot_born/1e6:.2f} "
                  f"(oracle {tot_orc/1e6:.2f}; win "
                  f"{tot_pm/max(tot_born,1):.2f}x of "
                  f"{tot_pm/max(tot_orc,1):.2f}x)")

    # key-quality diagnostic: rank correlation of seed cost (S=8) with
    # each depth's true per-lane totals on the eval samples
    seed = grand.reshape(npix, SPP)[:, :8].mean(axis=1)
    per_lane_seed = np.repeat(seed, SPP - 8)
    base_idx = np.arange(npix * SPP).reshape(npix, SPP)[:, 8:].reshape(-1)
    for name, qs in (("shadow", shadow), ("primary", primary)):
        cs = []
        for t in qs:
            a = t[base_idx].astype(np.float64)
            r = np.corrcoef(np.argsort(np.argsort(per_lane_seed)),
                            np.argsort(np.argsort(a)))[0, 1]
            cs.append(f"{r:.3f}")
        print(f"rank-corr seed-vs-{name}: " + " ".join(cs))


if __name__ == "__main__":
    main()
