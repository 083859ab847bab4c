"""Render settings.

The reference hard-codes its knobs as `pub const`s (reference
src/setup.rs:16-44) and in `main` (src/main.rs:47-57). Here they are a
frozen dataclass that is passed as a *static* argument to the jitted render
functions, so every combination compiles to a specialized XLA program.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """All compile-time render knobs.

    Mirrors reference src/setup.rs:16-44 plus the frame-loop constants from
    src/main.rs:47-57 and the integrator construction (src/main.rs:53-56).
    """

    # Image resolution (w, h). Reference: RESOLUTION (src/setup.rs:16).
    resolution: tuple[int, int] = (1280, 720)

    # Samples per pixel. The reference multiplies its SAMPLES const by the
    # SIMD width of 4 (src/setup.rs:22, src/film.rs:434); here `spp` is the
    # *effective* per-pixel sample count.
    spp: int = 8

    # Indirect bounce count (src/setup.rs:30).
    max_bounces: int = 3

    # Equi-angular volume scattering samples per path vertex (src/setup.rs:25).
    volume_marches: int = 2

    # Number of lights sampled per NEE event. The reference samples 4 lights
    # per wide (4-lane) shading batch with a correction factor of
    # n_lights/4 (src/integrator.rs:76-94); we sample `nee_light_samples`
    # per ray with correction n_lights/nee_light_samples.
    nee_light_samples: int = 4

    # World-sphere radius; rays are traced up to 2*world_radius
    # (src/setup.rs:33, src/film.rs:556).
    world_radius: float = 100.0

    # Extra AOV channels beyond the reference's fixed four
    # (Color/Alpha/Background/WorldNormal) — names from
    # render/aovs.py AOV_SPECS ("depth", "position", "albedo",
    # "mat_id"), accumulated at depth 0 for receiving lanes (the
    # reference's macro-generated channel system, src/film.rs:25-120,
    # re-expressed as a registry instead of five-file edits).
    extra_aovs: tuple = ()

    # SDF level-of-detail scale (src/setup.rs:37).
    sdf_detail_scale: float = 0.5

    # Sphere-march iteration caps (reference src/sdf.rs:9-10).
    max_marches: int = 256
    max_vis_marches: int = 100

    # --- shadow-march cost reduction (round-3 study; BASELINE.md) ----------
    # Truncated-iteration distance estimator for *shadow* marches only
    # (NEE + volume visibility tests). 0 = full DE (reference-faithful).
    # The fractal shadow march is the dominant device-time term and its
    # cost is linear in DE iterations; visibility needs far less DE
    # precision than primary hits. Fidelity measured per-value in
    # BASELINE.md (oracle RMSE + fused statistical gate). Only effective
    # for SDF programs with a reduce_fn (e.g. mandelbox).
    shadow_de_iterations: int = 0

    # Scale on the shadow-march hit epsilons (eps_c = 1e-4*detail*scale,
    # eps_l = 1e-5*detail*scale; reference src/sdf.rs:36,48). > 1
    # terminates shadow marches earlier at the cost of slightly fattened
    # occluders. 1.0 = reference-faithful.
    shadow_eps_scale: float = 1.0

    # Clip shadow segments to the scene's SDF bounding sphere
    # (SceneStatic.sdf_bound_radius, set via SceneBuilder.set_sdf):
    # march start jumps to the bounding-sphere entry and the segment end
    # is clipped to the exit, so lanes whose segment misses the bounding
    # volume skip the march entirely. Exact when the radius truly bounds
    # the {|DE| < eps} shell (both march paths implement the identical
    # clip, so fused == unfused lane-for-lane).
    shadow_bv_clip: bool = True

    # Reconstruction filter importance-sampling table size
    # (reference src/filter.rs:187).
    filter_table_size: int = 512

    # Sampler: "rd" = precomputed R_d low-discrepancy table with
    # Cranley-Patterson rotation (reference src/sampler.rs:18-37), or
    # "hash" = counter-based PCG hash streams (fully shardable, no table).
    sampler: str = "rd"

    # Multiple importance sampling between NEE and BSDF sampling for
    # emitters that are *paired* (a sphere light co-located with an
    # emissive sphere, auto-detected at scene build or paired explicitly
    # via SceneBuilder.pair_light). The reference leaves power_heuristic
    # dead (src/math.rs:193-199) and double-counts co-located
    # light/emissive pairs by construction (src/setup.rs:107-122);
    # default False stays reference-faithful. With True, NEE
    # contributions from paired lights and BSDF-hit emission of paired
    # emissive spheres are power-heuristic weighted so each paired
    # emitter is counted once (exactly unbiased when the pair's two
    # emission values agree; see docs/PARITY.md).
    mis: bool = False

    # --- compat quirks -----------------------------------------------------
    # The reference samples the specular (Phong) lobe azimuth as
    # `phi = 2*u` radians instead of `2*pi*u` (reference src/math.rs:111),
    # which biases specular azimuth to a ~0.32 slice of the circle. Off by
    # default (we use the correct 2*pi*u); enable to replicate the
    # reference's images exactly.
    compat_spec_phi: bool = False

    # The reference computes the specular reflection axis as
    # `wo.reflected(n) = wo - 2(wo.n)n` (reference src/material.rs:229 via
    # ultraviolet), which points the Phong lobe *through* the surface; most
    # lobe samples then fail the below-horizon test (src/material.rs:241).
    # Off by default (we mirror wo about n: `2(wo.n)n - wo`).
    compat_spec_reflect: bool = False

    # Max rays traced per device pass (the analog of reference's 16x16
    # tiles, src/main.rs:69). With the Pallas march kernels' block-local
    # early exit, bigger passes amortize dispatch (measured on v5e,
    # fractal: 2^18 -> 1.00, 2^19 -> 1.06, 2^20 -> 1.08 Msamples/s); with
    # use_pallas off, the jnp while_loops are bounded by the slowest lane
    # per pass and ~2^18 is better.
    rays_per_pass: int = 1 << 20

    # Use the Pallas VMEM-resident march kernel for primary/bounce
    # intersection on TPU backends (falls back to the jnp while_loop on
    # CPU or for SDF programs without a component-form dist function).
    # Measured on v5e: pallas 29 ms vs jnp 40 ms per 1M coherent rays.
    use_pallas: bool = True

    # Pallas for the *shadow* occlusion march. At small blocks the
    # sequential Pallas grid loses to one wide XLA while_loop, but at
    # 64-128 rows per block it wins ~20-25% (measured 20.6 ms pallas
    # vs 25.2 ms jnp per 1M realistic NEE segments on v5e, bit-identical
    # results).
    use_pallas_occlusion: bool = True

    # Rows per occlusion-march block (optimum 64-128 on v5e; coarser
    # blocks amortize grid overhead, shadow rays rarely exit early).
    pallas_occl_block_rows: int = 64

    # March each ray's shadow segments (L NEE + volume_marches*L
    # equi-angular) back-to-back in ONE Pallas while loop instead of one
    # sequential block-max loop per segment. Every per-segment step
    # sequence and verdict is untouched (bit-identical, enforced by
    # tests); only the loop *scheduling* changes: a block then costs
    # max-over-lanes of per-ray TOTAL steps instead of the sum of
    # per-segment block maxima — 1.58-1.73x fewer block iterations on
    # captured in-situ queues (tools/perf_chained_predict.py), at the
    # price of a one-hot segment-register refresh (~25% of a MandelBox
    # DE) per iteration. Applies to both the fused shadow kernels and
    # the unfused batched occlusion call.
    chained_shadow_march: bool = True

    # Advance lanes between chained segments only every this many march
    # iterations (1 = every iteration). The one-hot segment-register
    # refresh is the chained march's per-iteration tax (~50% of a
    # 12-iteration MandelBox DE measured end-to-end, round-4); grouping
    # runs it under a lax.cond at 1/G the frequency. Resolved lanes idle
    # <= G-1 iterations before starting their next segment — per-segment
    # step sequences and verdicts stay bit-identical (tests) — and a
    # block whose unresolved lanes are ALL waiting refreshes
    # immediately, so straggler tails pay no idle. Hardware sweeps
    # 2026-08-19: captured-queue kernels G=8 +14.5% over G=1
    # (tools/perf_chained_group.py); full 512x512 fractal pass
    # G=1/4/8 -> 664/624/626 ms with cost-sort ON
    # (tools/perf_group_pass_ab.py) — G=4 ships.
    chained_advance_group: int = 4

    # Sort the wavefront by a per-ray chained-march cost key before the
    # fused bounce tail at depths >= 1 (and unsort after). The key
    # (shade_pallas.shadow_sort_key) prices each ray's 12 shadow
    # segments at length / first-DE-step — ~1% of the march it
    # schedules — and the sort packs expensive rays into the same
    # Pallas blocks, cutting the chained march's block iterations
    # (modeled 1.5-2.2x at per-LANE granularity,
    # tools/perf_chained_predict.py). Per-ray results are bit-identical:
    # sorting changes block membership only, and the bounce output is
    # unsorted back to pixel-major order before the film splat.
    # Round-3's per-lane 40/28-column variadic sort was
    # compile-pathological (45-min DNF) AND gather-bound (95 ms/M,
    # tools/perf_sorted_decomp.py); the shipped form permutes CHUNKS of
    # adjacent pixel-coherent lanes by summed key — compiles in minutes
    # and the permutation is sub-ms. Hardware A/B 2026-08-18
    # (tools/perf_sorted_ab.py + perf_sorted_chunk_sweep.py): 705 ->
    # 659 ms per 1M-ray fractal pass (+6.7%); chunk sweep 2048/512/128/
    # 32 -> 673/659/660/682 ms (auto=512 optimal). Default ON; costs
    # ~+1 min of one-time compile on the sorted pass program.
    sorted_shadow_march: bool = True

    # Lanes per cost-sort unit. 0 = auto (largest of 512/128/8 dividing
    # the pass size — see integrator._sort_chunk). Finer chunks pack
    # blocks better but dilute pixel coherence inside a Pallas block;
    # per-lane granularity is gather-bound (see sorted_shadow_march).
    sorted_chunk: int = 0

    # Chunk-sort the wavefront by a PRE-intersect primary-march cost key
    # (sphere-fold bound over first DE, integrator._intersect_cost_key)
    # at depths >= 1, composing with the shadow sort's permutation for
    # one unsort at bounce end. Bit-identical (block membership only).
    # The captured-queue model (tools/perf_block_model.py) measures
    # 1.34x fewer intersect-march lane-iterations at depths 1-3; depth 0
    # stays pixel-major (sorting it is a measured loss in the model).
    sorted_intersect: bool = True

    # Two-phase occlusion march: phase 1 marches the whole shadow queue
    # this many steps, then the unresolved stragglers are stable-
    # partitioned to the front and finished densely (all-resolved tail
    # blocks exit after one step). 0 disables (single-phase kernel).
    # Bit-identical results either way; a per-block early exit is
    # otherwise bounded by the slowest lane in each 8K-lane block.
    # Measured a net loss on v5e (per-lane gathers ~7 ms/M); superseded
    # by occl_sort_steps.
    occl_phase1_steps: int = 0

    # Sorted two-phase occlusion march (march_occlusion_sorted): march
    # everyone this many steps, payload-sort the queue by each lane's
    # predicted remaining steps (XLA TPU sorts carry payload columns at
    # ~1-3 ms/M vs 7 ms/M per gather), finish in step-homogeneous
    # blocks, un-permute with one 2-column sort. Bit-identical results.
    # Default OFF: a 16% win on synthetic single-segment batches, but a
    # measured LOSS on the real captured in-situ queue (38 vs 24.5 ms at
    # 3.1M lanes, s1 in 4-16) — in situ the plain kernel already runs at
    # 7.9 ms/M (76% inactive lanes make block exits effective) and the
    # speed-based remaining-steps predictor misclassifies soon-to-hit
    # creeping lanes as stragglers. See BASELINE.md round-2 notes.
    occl_sort_steps: int = 0

    # Fused per-bounce shadow pipeline (ops/shade_pallas.py): sampler,
    # light pick, cone sampling, BSDF eval, transmittance, sphere
    # occlusion, SDF shadow march and radiance accumulation in ONE Pallas
    # kernel — the unfused path materializes ~40 XLA fusion results per
    # bounce to HBM. Falls back automatically (with a one-time warning)
    # for scenes the kernel cannot host: no component-form SDF,
    # non-scalar SDF params, march relaxation, CPU backend. MIS, any
    # number of SDF instances (in-kernel closest/occlusion folds, round
    # 5) and animated light/sphere channels with NO knot limit (positions
    # resolved outside the kernels, rounds 4-5) all run fused.
    # Measured on v5e: 769 vs 883 ms per 1M-ray fractal pass; streams
    # identical, radiance equal up to f32 association (rare grazing
    # visibility flips; fused-vs-unfused image RMSE < 5e-4, tested).
    use_fused_shadows: bool = True

    # Fused emission + scatter + roulette + termination kernel
    # (shade_pallas.finish_bounce_fused): steps 2 and 5-7 of a bounce in
    # one Pallas kernel instead of the XLA elementwise-chain tail. Only
    # active when the fused-shadow gate passes (same eligibility).
    use_fused_finish: bool = True

    # Whole-bounce-tail mega-kernel (shade_pallas.bounce_tail_fused):
    # the shadow pipeline and the finish pipeline merged into ONE Pallas
    # kernel — the two-kernel path re-reads ~17 per-lane arrays and
    # round-trips the radiance delta through HBM between them. Same
    # formulas/streams/association order (equivalence tested); only
    # active when the fused-shadow gate passes and the scene has lights.
    # Off = the two-kernel path (shadow_radiance + finish_bounce_fused).
    use_fused_bounce_tail: bool = True

    # Fused closest-hit + shading-info Pallas kernel
    # (ops/intersect_pallas.py): sphere fold, sphere-bounded SDF march,
    # tetrahedral normal and shading selects in one kernel instead of
    # XLA stages round-tripping HBM between them. Same fallback rules as
    # use_fused_shadows (constant sphere channels, component-form SDF,
    # no relaxation, TPU backend).
    use_fused_intersect: bool = True

    # Sorted two-phase *primary* march (march_sorted): the occl_sort_steps
    # scheme applied to closest-hit marching. 0 disables (same in-situ
    # rationale as occl_sort_steps). Only used when march_relaxation ==
    # 1.0 (the relaxed kernel carries extra state).
    march_sort_steps: int = 0

    # Rays per Pallas march block (block_rows * 128; min 8 rows). Smaller
    # blocks give finer-grained early exit; larger blocks amortize grid
    # overhead. 64 measured best for the primary march on v5e
    # (10.6 ms vs 13.0 at 16 vs 15.6 jnp per 2^18 camera rays).
    pallas_block_rows: int = 64

    # Over-relaxation factor for sphere tracing (Keinert et al.): step by
    # relax*DE with a conservative fallback on overshoot. 1.0 = the
    # reference's plain marching (src/sdf.rs:59-83); ~1.4-1.6 cuts march
    # step counts 25-40% with identical hits.
    march_relaxation: float = 1.0

    # Compact the wavefront between bounces: a stable partition moves
    # dead lanes to the tail so Pallas march blocks are either
    # dense-alive or all-dead (which exit after one step). The TPU analog
    # of the reference's repack-to-dense (src/film.rs:604-625); outputs
    # are unaffected because every lane carries its pixel id. Off by
    # default: it only pays when the Pallas march path dominates.
    compact_bounces: bool = False

    def __post_init__(self):
        assert self.sampler in ("rd", "hash"), self.sampler
        assert self.spp >= 1 and self.max_bounces >= 0

    # ---- sampler dimension layout (documented in rayn_tpu/utils/rng.py) ----
    @property
    def sets_1d_per_depth(self) -> int:
        # light picks + volume light picks + volume distance + fresnel + roulette
        return self.nee_light_samples + self.volume_marches * (self.nee_light_samples + 1) + 2

    @property
    def sets_2d_per_depth(self) -> int:
        # NEE light samples + volume light samples + diffuse dir + spec dir
        return self.nee_light_samples * (1 + self.volume_marches) + 2

    @property
    def num_1d_sets(self) -> int:
        # set 0 = shutter time jitter (reference src/film.rs:509-512)
        return 1 + (self.max_bounces + 1) * self.sets_1d_per_depth

    @property
    def num_2d_sets(self) -> int:
        # set 0 = pixel uv (filter importance sampling), set 1 = lens
        # (reference src/film.rs:466-507, :521-523)
        return 2 + (self.max_bounces + 1) * self.sets_2d_per_depth
