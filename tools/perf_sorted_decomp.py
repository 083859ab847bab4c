#!/usr/bin/env python
"""Decompose the cost-sorted scheduler's end-to-end delta (round 4).

The packed-gather rework (integrator._permute_rows) fixed the round-3
compile pathology (66 s compile vs 45-min DNF) but the sorted leg
measured SLOWER end-to-end (829 vs 690 ms/pass). Two hypotheses:
  (a) the permute machinery (pack -> 2-col sort -> row gather -> unpack,
      twice per sorted bounce) costs more than the scheduling saves;
  (b) the cost key's block-packing win doesn't materialize on hardware.

Three legs separate them:
  1. chained (baseline)
  2. sorted with a ZERO key (identity permutation: pays ALL the permute
     overhead, changes NO scheduling)
  3. sorted with the real key (overhead + scheduling)

scheduling win = leg2 - leg3;  overhead = leg2 - leg1.

Plus a microbench of one _permute_rows round trip at 1M lanes.
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def micro_permute(n=1 << 20, reps=8):
    """One sort-by-key + packed gather + unsort round trip on a
    synthetic full-width bounce state (49 f32-equivalent columns)."""
    from rayn_tpu.ops import intersect
    from rayn_tpu.render import integrator

    key = jax.random.uniform(jax.random.PRNGKey(0), (n,))
    z3 = jnp.zeros((n, 3), jnp.float32)
    z1 = jnp.zeros((n,), jnp.float32)
    i1 = jnp.zeros((n,), jnp.int32)
    state = integrator.PathState(
        origin=z3, direction=z3, time=z1, radiance=z3, throughput=z3,
        pixel=i1, sample_idx=i1, alive=i1 != 0, prev_pdf=z1,
        color_out=z3, bg_out=z3, alpha_out=z1, normal_out=z3)
    hit = intersect.Hit(z1, i1, i1 != 0)
    info = intersect.ShadingInfo(point=z3, normal=z3, offset_by=z1, mat=i1)

    @jax.jit
    def roundtrip(state, hit, info, key):
        st, h, inf, perm = integrator._sort_by_cost(state, hit, info, key)
        st = integrator._unsort_state(st, perm)
        return st.origin[0, 0] + h.t[0] + inf.offset_by[0]

    r = roundtrip(state, hit, info, key)
    float(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = roundtrip(state, hit, info, key)
    float(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"permute round trip (sort+gather+unsort) @1M: {dt*1e3:.2f} ms",
          flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("RAYN_JAX_CACHE", "/tmp/rayn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from perf_sorted_ab import time_leg
    from rayn_tpu.config import RenderSettings
    from rayn_tpu.ops import shade_pallas
    from rayn_tpu.scene import presets

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    micro_permute()

    res = (512, 512)
    base = RenderSettings(resolution=res, spp=128, rays_per_pass=1 << 20)
    data, static, camera = presets.default_scene(resolution=res)

    time_leg("chained (baseline)", base, data, static, camera)

    real_key = shade_pallas.shadow_sort_key

    def zero_key(*args, **kwargs):
        n = args[5].shape[0]  # info.point is the 6th positional arg
        return jnp.zeros((n,), jnp.float32)

    # distinct filter_table_size forces a fresh trace past the jit cache
    shade_pallas.shadow_sort_key = zero_key
    try:
        time_leg("sorted, ZERO key (overhead only)",
                 dataclasses.replace(base, sorted_shadow_march=True,
                                     filter_table_size=511),
                 data, static, camera)
    finally:
        shade_pallas.shadow_sort_key = real_key

    time_leg("sorted, real key (overhead+scheduling)",
             dataclasses.replace(base, sorted_shadow_march=True),
             data, static, camera)


if __name__ == "__main__":
    main()
