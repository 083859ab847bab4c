"""Frame renderer: ray generation -> wavefront trace -> film splat.

The TPU analog of `Film::render_frame_into` (reference
src/film.rs:380-628). Instead of 16x16 CPU tiles on a rayon pool, the
frame's (pixel, sample) grid is flattened into one big ray index space
and rendered in fixed-size *passes* sized for HBM; each pass is a single
jitted program: generate camera rays (filter-importance-sampled pixel
offsets + shutter-time jitter), run the unrolled bounce loop, and
scatter-add terminated channels into the film accumulator.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import filters as filter_ops
from rayn_tpu.render import film as film_mod
from rayn_tpu.render.camera import Camera
from rayn_tpu.render.integrator import init_state, trace
from rayn_tpu.scene.scene import SceneData, SceneStatic
from rayn_tpu.utils import rng
from rayn_tpu.utils.rng import SampleTables


def ray_indices(pass_start: jnp.ndarray, pass_size: int) -> jnp.ndarray:
    """Flat ray ids for one pass, built on device (shipping a host-side
    arange through the interconnect cost ~4 MB/pass)."""
    return pass_start + jnp.arange(pass_size, dtype=jnp.int32)


def generate_rays(settings: RenderSettings, tables: SampleTables,
                  camera: Camera, fis_table: jnp.ndarray,
                  ray_idx: jnp.ndarray, t0: jnp.ndarray, t1: jnp.ndarray,
                  sample_base: int = 0):
    """Camera rays for flat ray indices (pixel-major, spp-minor).

    Mirrors reference src/film.rs:456-527: per-sample FIS pixel offset,
    NDC mapping (pixel center + offset over resolution,
    src/film.rs:694-709), shutter-time jitter, lens samples.

    `sample_base` offsets the per-pixel sample index: a render with
    settings.spp = K and sample_base = B produces exactly the rays with
    sample indices [B, B+K) of every pixel — the progressive-spp
    mechanism (render_frame's segment loop). The samplers are pure
    counter functions of (pixel, sample_idx), so these rays are
    bit-identical to the corresponding rays of a flat spp >= B+K render.
    """
    w, h = settings.resolution
    n_pixels = w * h
    total = n_pixels * settings.spp
    in_range = ray_idx < total
    safe_idx = jnp.minimum(ray_idx, total - 1)
    pixel = (safe_idx // settings.spp).astype(jnp.int32)
    sample_idx = (safe_idx % settings.spp).astype(jnp.int32) + sample_base
    x = (pixel % w).astype(jnp.float32)
    y = (pixel // w).astype(jnp.float32)

    u_px = rng.sample_2d(settings, tables, rng.set2d_pixel_uv(),
                         sample_idx, pixel)
    off_x = filter_ops.fis_sample(fis_table, u_px[:, 0])
    off_y = filter_ops.fis_sample(fis_table, u_px[:, 1])
    ndc = jnp.stack([(x + 0.5 + off_x) / w, (y + 0.5 + off_y) / h], axis=-1)

    u_t = rng.sample_1d(settings, tables, rng.set1d_time(), sample_idx, pixel)
    time = t0 + (t1 - t0) * u_t

    lens = rng.sample_2d(settings, tables, rng.set2d_lens(),
                         sample_idx, pixel)
    origin, direction = camera.generate(ndc, time, lens)
    return origin, direction, time, pixel, sample_idx, in_range


def _pass_body(film: film_mod.Film, data: SceneData, static: SceneStatic,
               settings: RenderSettings, tables: SampleTables,
               camera: Camera, fis_table: jnp.ndarray,
               pass_start: jnp.ndarray, pass_size: int,
               t0: jnp.ndarray, t1: jnp.ndarray,
               sample_base: int = 0) -> film_mod.Film:
    ray_idx = ray_indices(pass_start, pass_size)
    origin, direction, time, pixel, sample_idx, in_range = generate_rays(
        settings, tables, camera, fis_table, ray_idx, t0, t1, sample_base)
    hps_abs0, hps_lin0 = camera.half_pixel_size_coeffs()
    state = init_state(origin, direction, time, pixel, sample_idx, in_range)
    state = trace(data, static, settings, tables, state, hps_abs0, hps_lin0)
    # When the pass covers whole pixels in pixel-major order (pass sizes
    # are spp-aligned and compaction hasn't permuted lanes), the film
    # scatter-add collapses to a reshape-sum + slice add — ~70 ms/pass
    # cheaper on v5e. Out-of-range tail lanes carry zero contributions
    # either way (alive starts False for them), so the aligned path's
    # row addressing is safe.
    if settings.extra_aovs and len(film.extra) != len(settings.extra_aovs):
        raise ValueError(
            "film was created without the configured extra AOVs — build "
            "it with film.new_film(n_pixels, settings)")
    if not settings.compact_bounces and pass_size % settings.spp == 0:
        pixel0 = (pass_start // settings.spp).astype(jnp.int32)
        return film_mod.splat_aligned(
            film, pixel0,
            color=state.color_out,
            alpha=state.alpha_out,
            background=state.bg_out,
            normal=state.normal_out,
            count=in_range.astype(jnp.float32),
            spp=settings.spp,
            extra=state.aovs)
    # Fallback: channels splatted via the *state's* pixel ids (compaction
    # may have permuted lanes); the per-pixel sample count uses the
    # original order (every in-range ray counts once regardless of fate).
    film = film_mod.splat(
        film, state.pixel,
        color=state.color_out,
        alpha=state.alpha_out,
        background=state.bg_out,
        normal=state.normal_out,
        count=jnp.zeros_like(state.alpha_out),
        extra=state.aovs)
    return film._replace(
        samples=film.samples.at[pixel].add(in_range.astype(jnp.float32)))


@functools.partial(jax.jit,
                   static_argnames=("static", "settings", "pass_size",
                                    "sample_base"),
                   donate_argnames=("film",))
def render_pass(film: film_mod.Film, data: SceneData, static: SceneStatic,
                settings: RenderSettings, tables: SampleTables,
                camera: Camera, fis_table: jnp.ndarray,
                pass_start: jnp.ndarray, pass_size: int,
                t0: jnp.ndarray, t1: jnp.ndarray,
                sample_base: int = 0) -> film_mod.Film:
    """Render one pass of rays [pass_start, pass_start+pass_size) and
    accumulate into the film. `sample_base` shifts the per-pixel sample
    indices (progressive spp; see generate_rays)."""
    return _pass_body(film, data, static, settings, tables, camera,
                      fis_table, pass_start, pass_size, t0, t1,
                      sample_base)


@functools.partial(jax.jit,
                   static_argnames=("static", "settings", "pass_size",
                                    "sample_base"),
                   donate_argnames=("film",))
def render_passes(film: film_mod.Film, data: SceneData,
                  static: SceneStatic, settings: RenderSettings,
                  tables: SampleTables, camera: Camera,
                  fis_table: jnp.ndarray, pass_start: jnp.ndarray,
                  pass_size: int, n_passes: jnp.ndarray,
                  t0: jnp.ndarray, t1: jnp.ndarray,
                  sample_base: int = 0) -> film_mod.Film:
    """Render `n_passes` consecutive passes in ONE device dispatch (a
    lax.fori_loop over the pass body, film as the carry). Per-ray MATH
    is the same as calling render_pass n_passes times, but the fori_loop
    context compiles the pass body with different float-contraction
    choices, so results can differ from render_pass at the ulp level —
    which breaks the repo's bit-identity contract between the
    sequential and per-chip frame paths (tests/test_sharding.py caught
    exactly that). Measured on v5e at 1080p the batching is also
    NEUTRAL once probe syncs are pipelined (2.5375 Ms/s at 1
    pass/dispatch vs 2.5352 at 4 — the host overhead the round-4 tail
    measurement attributed to dispatches was the blocking syncs), so
    render_frame defaults to passes_per_dispatch=1 via the render_pass
    program and this grouped dispatch is an opt-in for hosts where
    dispatch overhead IS measured to matter. `n_passes` is a traced
    scalar: one compiled program serves any group size, including the
    tail group."""
    def body(i, f):
        return _pass_body(f, data, static, settings, tables, camera,
                          fis_table, pass_start + i * pass_size,
                          pass_size, t0, t1, sample_base)

    return jax.lax.fori_loop(0, n_passes, body, film)


# Test-only fault injection point: called with the pass index after every
# completed pass (tests/test_checkpoint_cli.py uses it to kill a render
# mid-frame and exercise render_frame_resilient's checkpoint resume).
_FAIL_HOOK = None

# Errors worth retrying: device/runtime failures (XlaRuntimeError — e.g.
# a preempted TPU, a dropped tunnel — subclasses RuntimeError) and host
# I/O hiccups. Programming errors (ValueError/TypeError from bad shapes
# or settings) are deterministic and re-raise immediately — retrying
# them `retries` times with identical inputs only delays the traceback.
_TRANSIENT_ERRORS = (RuntimeError, OSError)


def render_frame_resilient(data: SceneData, static: SceneStatic,
                           settings: RenderSettings, camera: Camera,
                           retries: int = 2, **kwargs) -> film_mod.Film:
    """render_frame with failure detection + elastic resume (SURVEY.md
    §5; no reference counterpart — the reference panics on any error,
    src/main.rs unwraps). A failed attempt is retried up to `retries`
    times (transient runtime/IO errors only; deterministic programming
    errors surface immediately); when a checkpoint_path is given, each
    retry resumes at the last persisted pass instead of ray 0, so a
    preempted or crashed render loses at most `checkpoint_every` passes
    of work."""
    import sys as _sys
    for attempt in range(retries + 1):
        try:
            return render_frame(data, static, settings, camera, **kwargs)
        except KeyboardInterrupt:
            raise
        except _TRANSIENT_ERRORS as e:
            if attempt == retries:
                raise
            where = ("resuming from checkpoint"
                     if kwargs.get("checkpoint_path")
                     else "restarting the frame")
            print(f"render attempt {attempt + 1} failed ({e!r}); {where}",
                  file=_sys.stderr)


def render_frame(data: SceneData, static: SceneStatic,
                 settings: RenderSettings, camera: Camera,
                 frame: int = 1, time_range: tuple[float, float] = None,
                 filter: Optional[filter_ops.Filter] = None,
                 frame_rate: float = 24.0,
                 shutter_speed: float = 1.0 / 24.0,
                 checkpoint_path: Optional[str] = None,
                 checkpoint_every: int = 4,
                 progress: Optional[callable] = None,
                 sync_every: int = 8,
                 passes_per_dispatch: int = 1,
                 mesh=None) -> film_mod.Film:
    """Render a full frame, splitting the (pixel, sample) grid into
    HBM-sized passes. Default frame timing matches reference
    src/main.rs:47-62: frame f covers [f/frame_rate, f/frame_rate +
    shutter_speed).

    With checkpoint_path set, the film accumulator is persisted every
    `checkpoint_every` passes and an interrupted render resumes where it
    stopped (preemptible rendering, SURVEY.md §5). `progress(done, total)`
    is called after every pass (the analog of the reference's per-tile
    progress bar, src/film.rs:636).

    With `mesh` set (a jax.sharding.Mesh), every pass is dealt across
    the mesh's devices with the film psum-merged over ICI
    (parallel.sharding.render_pass_sharded); checkpointing, retries,
    progress and the bounded async queue behave identically because the
    merged film is replicated — a preempted multi-chip render resumes
    from the same .npz a single-chip one would.

    Progressive spp: re-running with a HIGHER settings.spp against an
    existing checkpoint renders only the missing per-pixel sample
    indices [spp_done, spp) and accumulates them onto the saved film
    (the samplers are counter-based in (pixel, sample_idx), so the
    result equals a flat spp render up to f32 film-accumulation order).
    A checkpoint that already holds >= spp samples is returned as-is —
    extra samples only sharpen the estimate."""
    import dataclasses

    w, h = settings.resolution
    if time_range is None:
        start = frame / frame_rate
        time_range = (start, start + shutter_speed)
    tables = rng.build_sample_tables(settings, frame)
    filt = filter or filter_ops.blackman_harris(1.5)
    fis_table = filter_ops.build_fis_table(filt, settings.filter_table_size)

    def seg_passes(spp_seg: int) -> tuple[int, int]:
        """(pass_size, n_passes) for a [*, *+spp_seg) sample segment."""
        seg_total = w * h * spp_seg
        if mesh is None:
            return min(settings.rays_per_pass, seg_total), \
                -(-seg_total // min(settings.rays_per_pass, seg_total))
        n_dev = mesh.devices.size
        per_dev = min(settings.rays_per_pass, -(-seg_total // n_dev))
        return per_dev * n_dev, -(-seg_total // (per_dev * n_dev))

    # Segment plan: (spp_base, spp_target, start_pass). Fresh render =
    # one segment [0, spp); a resumed render first finishes the
    # checkpoint's in-flight segment, then (if spp grew) appends the
    # extension segment [ckpt_spp, spp).
    film = film_mod.new_film(w * h, settings)
    segments: list[tuple[int, int, int]] = [(0, settings.spp, 0)]
    if checkpoint_path:
        from rayn_tpu.render import checkpoint as ckpt
        prog = ckpt.load_progress(checkpoint_path, settings, frame,
                                  scene=data, camera=camera,
                                  fis_table=fis_table,
                                  time_range=time_range)
        if prog is not None:
            film = prog.film
            segments = []
            n_seg = seg_passes(prog.spp - prog.spp_base)[1]
            if prog.next_pass < n_seg:
                segments.append((prog.spp_base, prog.spp, prog.next_pass))
            if prog.spp < settings.spp:
                segments.append((prog.spp, settings.spp, 0))

    t0 = jnp.float32(time_range[0])
    t1 = jnp.float32(time_range[1])
    sync_every = max(1, sync_every)
    grand_total = w * h * max(settings.spp,
                              segments[-1][1] if segments else 0)
    if segments:
        sb0, st0, p00 = segments[0]
        done = w * h * sb0 + min(p00 * seg_passes(st0 - sb0)[0],
                                 w * h * (st0 - sb0))
    else:
        done = grand_total

    for sb, st, start_pass in segments:
        spp_seg = st - sb
        seg_settings = dataclasses.replace(settings, spp=spp_seg)
        pass_size, n_passes = seg_passes(spp_seg)
        if mesh is not None:
            from rayn_tpu.parallel import sharding as _sharding
            per_dev = pass_size // mesh.devices.size

            @jax.jit
            def _sharded_pass(film, data, tables, camera, fis_table,
                              pass_start, t0, t1,
                              _s=seg_settings, _pd=per_dev, _base=sb):
                return _sharding.render_pass_sharded(
                    mesh, film, data, static, _s, tables, camera,
                    fis_table, pass_start, _pd, t0, t1, sample_base=_base)

        import collections
        probes = collections.deque()
        # Dispatch cadence: passes_per_dispatch > 1 batches passes into
        # one render_passes fori_loop dispatch — an opt-in for hosts
        # where per-dispatch overhead is measured to matter (on v5e
        # under axon it is NEUTRAL once probe syncs are pipelined, and
        # the fori_loop context costs bit-identity with the per-chip
        # frame path, see render_passes). Groups clamp to checkpoint
        # boundaries so checkpoint_every keeps its pass-granular
        # meaning; the mesh path stays per-pass (its dispatch is the
        # shard_map program).
        group_max = max(1, passes_per_dispatch) if mesh is None else 1
        p = start_pass
        while p < n_passes:
            group = min(group_max, n_passes - p)
            if checkpoint_path:
                group = min(group, checkpoint_every
                            - (p % checkpoint_every))
            if mesh is None and group == 1:
                # The render_pass program, NOT render_passes(k=1): the
                # fori_loop context contracts floats differently at the
                # ulp level, and the per-chip frame path
                # (parallel.sharding.render_frames_per_chip) bit-matches
                # against THIS program (tests/test_sharding.py).
                film = render_pass(film, data, static, seg_settings,
                                   tables, camera, fis_table,
                                   jnp.int32(p * pass_size), pass_size,
                                   t0, t1, sample_base=sb)
            elif mesh is None:
                film = render_passes(film, data, static, seg_settings,
                                     tables, camera, fis_table,
                                     jnp.int32(p * pass_size), pass_size,
                                     jnp.int32(group), t0, t1,
                                     sample_base=sb)
            else:
                film = _sharded_pass(film, data, tables, camera, fis_table,
                                     jnp.int32(p * pass_size), t0, t1)
            if _FAIL_HOOK is not None:
                # per-pass contract: one call per completed pass index
                for p_i in range(p, p + group):
                    _FAIL_HOOK(p_i)
            # Bounded async queue, pipelined: letting donated-film passes
            # queue ~90 deep measured ~5x slower per pass, so the queue
            # is capped at `sync_every` in-flight passes — but instead of
            # blocking on the dispatch just issued (which idles the
            # device for the ~44 ms axon readback roundtrip, round-2
            # measurement), each dispatch enqueues a tiny non-donated
            # scalar probe (film.samples[-1], dispatched before the film
            # is donated to the next group) and the host blocks on the
            # OLDEST probe once `sync_every` passes are in flight,
            # overlapping the roundtrip with queued device work. A
            # checkpoint save still fully drains (its host transfer must
            # see a finished film).
            probes.append((group, film.samples[-1]))
            want_ckpt = checkpoint_path and (
                (p + group) % checkpoint_every == 0
                or p + group == n_passes)
            if want_ckpt or p + group == n_passes:
                while probes:
                    float(probes.popleft()[1])
            elif sum(g for g, _ in probes) >= sync_every:
                float(probes.popleft()[1])
            done = min(done + pass_size * group, grand_total)
            if progress is not None:
                progress(done, grand_total)
            if want_ckpt:
                from rayn_tpu.render import checkpoint as ckpt
                ckpt.save(checkpoint_path, film, settings, frame,
                          p + group, scene=data, camera=camera,
                          fis_table=fis_table, time_range=time_range,
                          spp_base=sb, spp=st)
            p += group
    return film
