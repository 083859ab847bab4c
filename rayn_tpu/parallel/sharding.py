"""Multi-chip rendering over a device mesh.

The reference's only scale-out is a rayon thread pool over 16x16 pixel
tiles with a mutex-guarded film merge (reference src/film.rs:630-692).
The TPU design shards the flat (pixel, sample) ray-index space across a
`jax.sharding.Mesh` with `shard_map`: every chip traces its slice of the
wavefront against the (replicated, small) scene and accumulates a local
film; a `psum` over the mesh's ICI replaces the mutex merge. Because the
samplers are counter-based / table+hash (rayn_tpu.utils.rng), any shard
of rays can be computed on any chip with bit-identical per-ray results
— shard count changes the image only through f32 film-reduction order
(tested to atol 2e-5 in tests/test_sharding.py).

Mesh layout: a 2D ("tile", "spp") mesh is exposed so frames can also be
dealt out pixel-major and sample-major independently; for film
accumulation both axes behave identically (psum over both), matching the
scaling-book recipe of annotating shardings and letting XLA place the
collectives on ICI.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import filters as filter_ops
from rayn_tpu.render import film as film_mod
from rayn_tpu.render import renderer
from rayn_tpu.utils import rng


def make_mesh(devices=None, tile_axis: Optional[int] = None) -> Mesh:
    """Build a ("tile", "spp") mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tile_axis is None:
        # widest tile axis that divides n
        tile_axis = n
        spp_axis = 1
    else:
        assert n % tile_axis == 0
        spp_axis = n // tile_axis
    dev_grid = np.asarray(devices).reshape(tile_axis, spp_axis)
    return Mesh(dev_grid, ("tile", "spp"))


def render_pass_sharded(mesh: Mesh, film, data, static,
                        settings: RenderSettings, tables, camera, fis_table,
                        pass_start, per_device: int, t0, t1,
                        sample_base: int = 0):
    """One render pass of `per_device * n_devices` rays, dealt out
    device-major, with the film psum-reduced across the mesh (replicated
    result). Ray ids are derived on each device from its mesh coordinates
    — nothing rides the interconnect but the film psum. `sample_base`
    shifts the per-pixel sample indices (progressive spp; see
    renderer.generate_rays)."""
    spp_size = mesh.shape["spp"]

    def local_pass(film, data, tables, camera, fis_table, pass_start, t0, t1):
        dev = (jax.lax.axis_index("tile") * spp_size
               + jax.lax.axis_index("spp"))
        start = pass_start + dev.astype(jnp.int32) * per_device
        local = renderer.render_pass(
            film_mod.new_film(film.color.shape[0], settings), data, static, settings,
            tables, camera, fis_table, start, per_device, t0, t1,
            sample_base=sample_base)
        summed = jax.tree.map(
            lambda x: jax.lax.psum(x, ("tile", "spp")), local)
        return jax.tree.map(jnp.add, film, summed)

    fn = jax.shard_map(
        local_pass,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        # pallas_call does not yet annotate its outputs with
        # varying-mesh-axes info, so the vma lint rejects the fused
        # Pallas kernels under shard_map (found by
        # tests/test_sharding.py::test_fused_kernels_under_shard_map).
        # Correctness is covered by the equality-vs-single-device tests.
        check_vma=False,
    )
    return fn(film, data, tables, camera, fis_table, pass_start, t0, t1)


def render_frames_per_chip(data, static, settings: RenderSettings, camera,
                           frames, mesh: Optional[Mesh] = None,
                           filter=None, frame_rate: float = 24.0,
                           shutter_speed: float = 1.0 / 24.0,
                           checkpoint_dir: Optional[str] = None,
                           retries: int = 0,
                           progress: Optional[callable] = None
                           ) -> list[film_mod.Film]:
    """Frame-level parallelism: deal whole frames across the mesh's
    devices, one frame per chip (BASELINE.json config #5; the
    reference's only frame loop is sequential, src/main.rs:47-58).

    Each device renders its entire frame locally — scene replicated,
    nothing rides the interconnect until the final per-frame film
    gather — so every frame's film is bit-identical to the sequential
    `renderer.render_frame` path (same pass structure, same scatter-add
    order, counter-based samplers salted only by the frame number).

    `frames` is a list of frame indices; it is processed in chunks of
    n_devices. Returns one Film per frame, in order.

    Elastic recovery (SURVEY.md §5, multi-chip parity): with
    `checkpoint_dir` set, every finished frame's film is persisted to
    `<dir>/frame_<f>.npz` (single-chip checkpoint format) and already-
    persisted frames are skipped on restart, so a preempted farm loses
    at most one in-flight chunk; transient chunk failures are retried
    `retries` times. `progress(frames_done, frames_total)` runs after
    each chunk."""
    devices = list((mesh.devices.flatten() if mesh is not None
                    else jax.devices()))
    w, h = settings.resolution
    total = w * h * settings.spp
    pass_size = min(settings.rays_per_pass, total)
    n_passes = -(-total // pass_size)
    filt = filter or filter_ops.blackman_harris(1.5)
    fis_table = filter_ops.build_fis_table(filt, settings.filter_table_size)

    if checkpoint_dir:
        import os

        from rayn_tpu.render import checkpoint as ckpt

        def _ckpt_path(f):
            return os.path.join(checkpoint_dir, f"frame_{f}.npz")

    frames = list(frames)
    by_frame: dict[int, film_mod.Film] = {}
    todo = []
    for f in frames:
        if checkpoint_dir:
            resumed = ckpt.load(_ckpt_path(f), settings, f, scene=data,
                                camera=camera, fis_table=fis_table)
            if resumed is not None and resumed[1] >= n_passes:
                by_frame[f] = resumed[0]
                continue
        if f not in by_frame and f not in todo:
            todo.append(f)

    def render_chunk(chunk):
        fmesh = Mesh(np.asarray(devices[:len(chunk)]), ("frame",))

        # Per-frame leading axis [F, ...]: sampler salt + shutter range.
        tables = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[rng.build_sample_tables(settings, f) for f in chunk])
        t0 = jnp.asarray([f / frame_rate for f in chunk], jnp.float32)
        t1 = t0 + jnp.float32(shutter_speed)

        def local_frames(data, tables, camera, fis_table, t0, t1):
            local_tables = jax.tree.map(lambda x: x[0], tables)
            film = film_mod.new_film(w * h, settings)
            for p in range(n_passes):
                film = renderer.render_pass(
                    film, data, static, settings, local_tables, camera,
                    fis_table, jnp.int32(p * pass_size), pass_size,
                    t0[0], t1[0])
            return jax.tree.map(lambda x: x[None], film)

        fn = jax.jit(jax.shard_map(
            local_frames,
            mesh=fmesh,
            in_specs=(P(), P("frame"), P(), P(), P("frame"), P("frame")),
            out_specs=P("frame"),
        ))
        out = fn(data, tables, camera, fis_table, t0, t1)
        jax.block_until_ready(out)
        return out

    done = len(by_frame)
    for chunk_start in range(0, len(todo), len(devices)):
        chunk = todo[chunk_start:chunk_start + len(devices)]
        for attempt in range(retries + 1):
            try:
                out = render_chunk(chunk)
                break
            except KeyboardInterrupt:
                raise
            except renderer._TRANSIENT_ERRORS:
                if attempt == retries:
                    raise
        for i, f in enumerate(chunk):
            film = jax.tree.map(lambda x: x[i], out)
            by_frame[f] = film
            if checkpoint_dir:
                ckpt.save(_ckpt_path(f), film, settings, f, n_passes,
                          scene=data, camera=camera, fis_table=fis_table)
        done += len(chunk)
        if progress is not None:
            progress(done, len(frames))
    return [by_frame[f] for f in frames]


def render_frame_sharded(data, static, settings: RenderSettings, camera,
                         frame: int = 1, mesh: Optional[Mesh] = None,
                         **kwargs) -> film_mod.Film:
    """Multi-chip `render_frame`: identical image to the single-chip path
    for any device count (determinism across shard counts, SURVEY.md §4).

    Thin wrapper over `renderer.render_frame(mesh=...)`, so the full
    single-chip feature set — checkpoint_path/checkpoint_every (the
    psum-merged film is replicated, the single-chip .npz format applies
    as-is), progress callback, and the bounded async queue (sync_every)
    — works unchanged on a mesh. For failure retry, use
    `renderer.render_frame_resilient(..., mesh=mesh)`."""
    return renderer.render_frame(data, static, settings, camera,
                                 frame=frame, mesh=mesh or make_mesh(),
                                 **kwargs)
