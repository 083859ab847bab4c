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
                        pass_start, per_device: int, t0, t1):
    """One render pass of `per_device * n_devices` rays, dealt out
    device-major, with the film psum-reduced across the mesh (replicated
    result). Ray ids are derived on each device from its mesh coordinates
    — nothing rides the interconnect but the film psum."""
    spp_size = mesh.shape["spp"]

    def local_pass(film, data, tables, camera, fis_table, pass_start, t0, t1):
        dev = (jax.lax.axis_index("tile") * spp_size
               + jax.lax.axis_index("spp"))
        start = pass_start + dev.astype(jnp.int32) * per_device
        local = renderer.render_pass(
            film_mod.new_film(film.color.shape[0]), data, static, settings,
            tables, camera, fis_table, start, per_device, t0, t1)
        summed = jax.tree.map(
            lambda x: jax.lax.psum(x, ("tile", "spp")), local)
        return jax.tree.map(jnp.add, film, summed)

    fn = jax.shard_map(
        local_pass,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(),
    )
    return fn(film, data, tables, camera, fis_table, pass_start, t0, t1)


def render_frames_per_chip(data, static, settings: RenderSettings, camera,
                           frames, mesh: Optional[Mesh] = None,
                           filter=None, frame_rate: float = 24.0,
                           shutter_speed: float = 1.0 / 24.0
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
    """
    devices = list((mesh.devices.flatten() if mesh is not None
                    else jax.devices()))
    w, h = settings.resolution
    total = w * h * settings.spp
    pass_size = min(settings.rays_per_pass, total)
    n_passes = -(-total // pass_size)
    filt = filter or filter_ops.blackman_harris(1.5)
    fis_table = filter_ops.build_fis_table(filt, settings.filter_table_size)

    films: list[film_mod.Film] = []
    frames = list(frames)
    for chunk_start in range(0, len(frames), len(devices)):
        chunk = frames[chunk_start:chunk_start + len(devices)]
        fmesh = Mesh(np.asarray(devices[:len(chunk)]), ("frame",))

        # Per-frame leading axis [F, ...]: sampler salt + shutter range.
        tables = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[rng.build_sample_tables(settings, f) for f in chunk])
        t0 = jnp.asarray([f / frame_rate for f in chunk], jnp.float32)
        t1 = t0 + jnp.float32(shutter_speed)

        def local_frames(data, tables, camera, fis_table, t0, t1):
            local_tables = jax.tree.map(lambda x: x[0], tables)
            film = film_mod.new_film(w * h)
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
        for i in range(len(chunk)):
            films.append(jax.tree.map(lambda x: x[i], out))
    return films


def render_frame_sharded(data, static, settings: RenderSettings, camera,
                         frame: int = 1, mesh: Optional[Mesh] = None,
                         time_range=None, filter=None,
                         frame_rate: float = 24.0,
                         shutter_speed: float = 1.0 / 24.0) -> film_mod.Film:
    """Multi-chip `render_frame`: identical image to the single-chip path
    for any device count (determinism across shard counts, SURVEY.md §4)."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    w, h = settings.resolution
    total = w * h * settings.spp
    if time_range is None:
        start = frame / frame_rate
        time_range = (start, start + shutter_speed)
    tables = rng.build_sample_tables(settings, frame)
    filt = filter or filter_ops.blackman_harris(1.5)
    fis_table = filter_ops.build_fis_table(filt, settings.filter_table_size)

    # pass size divisible by the device count
    per_dev = min(settings.rays_per_pass, -(-total // n_dev))
    pass_size = per_dev * n_dev
    n_passes = -(-total // pass_size)

    film = film_mod.new_film(w * h)
    t0 = jnp.float32(time_range[0])
    t1 = jnp.float32(time_range[1])

    @jax.jit
    def step(film, data, tables, camera, fis_table, pass_start, t0, t1):
        return render_pass_sharded(mesh, film, data, static, settings,
                                   tables, camera, fis_table, pass_start,
                                   per_dev, t0, t1)

    for p in range(n_passes):
        film = step(film, data, tables, camera, fis_table,
                    jnp.int32(p * pass_size), t0, t1)
        # per-pass scalar sync; see rayn_tpu.render.renderer.render_frame
        float(film.samples[-1])
    return film
