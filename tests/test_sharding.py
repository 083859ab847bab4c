"""Multi-device sharding tests on the 8-way virtual CPU mesh
(SURVEY.md §4: multi-chip without a cluster)."""

import jax
import numpy as np
import pytest

from rayn_tpu.config import RenderSettings
from rayn_tpu.parallel import sharding
from rayn_tpu.render import film as film_mod
from rayn_tpu.render import renderer
from rayn_tpu.scene import presets


def settings():
    return RenderSettings(resolution=(16, 12), spp=4, max_bounces=2,
                          volume_marches=1, max_marches=32,
                          max_vis_marches=16, rays_per_pass=1 << 12)


def test_mesh_shapes():
    m = sharding.make_mesh()
    assert m.devices.size == len(jax.devices())
    m2 = sharding.make_mesh(tile_axis=2)
    assert m2.shape["tile"] == 2
    assert m2.shape["spp"] == len(jax.devices()) // 2


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_matches_single_chip(n_dev):
    s = settings()
    data, static, cam = presets.spheres_scene(resolution=s.resolution)
    ref = film_mod.resolve(
        renderer.render_frame(data, static, s, cam, frame=1), s.resolution)
    mesh = sharding.make_mesh(jax.devices()[:n_dev])
    got = film_mod.resolve(
        sharding.render_frame_sharded(data, static, s, cam, frame=1,
                                      mesh=mesh), s.resolution)
    # Determinism across shard counts: identical sampler streams make the
    # image independent of device count (up to f32 reduction order in the
    # film scatter, which is also fixed per pixel here).
    np.testing.assert_allclose(got.color, ref.color, atol=2e-5)
    np.testing.assert_allclose(got.alpha, ref.alpha, atol=1e-6)
    np.testing.assert_allclose(got.background, ref.background, atol=2e-5)


def test_frames_per_chip_bitmatch_sequential():
    """Frame-level parallelism (BASELINE config #5): 8 frames dealt one
    per device must each BIT-match the sequential render_frame path —
    each frame's film is computed entirely on one chip with the same
    pass structure, so not even reduction order differs."""
    s = settings()
    data, static, cam = presets.spheres_scene(resolution=s.resolution)
    frames = list(range(1, 9))
    films = sharding.render_frames_per_chip(data, static, s, cam, frames)
    assert len(films) == len(frames)
    for f, film in zip(frames, films):
        ref = renderer.render_frame(data, static, s, cam, frame=f)
        np.testing.assert_array_equal(np.asarray(film.color),
                                      np.asarray(ref.color))
        np.testing.assert_array_equal(np.asarray(film.samples),
                                      np.asarray(ref.samples))
    # distinct frames produced distinct images (frame salt + shutter)
    assert not np.array_equal(np.asarray(films[0].color),
                              np.asarray(films[7].color))


def test_frames_per_chip_fractal_bitmatch():
    """Fractal scene under frame-per-chip: the jnp march while_loops
    must type-check under shard_map even though the constant camera
    origin is replicated over the frame axis (vma regression test) and
    the result must bit-match the sequential path."""
    s = settings()
    data, static, cam = presets.default_scene(resolution=s.resolution)
    films = sharding.render_frames_per_chip(data, static, s, cam, [1, 2])
    ref = renderer.render_frame(data, static, s, cam, frame=2)
    np.testing.assert_array_equal(np.asarray(films[1].color),
                                  np.asarray(ref.color))


def test_frames_per_chip_chunks_beyond_device_count():
    """More frames than devices: processed in chunks, order preserved."""
    s = settings()
    data, static, cam = presets.spheres_scene(resolution=s.resolution)
    frames = list(range(1, 12))  # 11 frames over 8 devices -> 8 + 3
    films = sharding.render_frames_per_chip(data, static, s, cam, frames)
    assert len(films) == 11
    ref = renderer.render_frame(data, static, s, cam, frame=11)
    np.testing.assert_array_equal(np.asarray(films[-1].color),
                                  np.asarray(ref.color))


def test_sharded_fractal_smoke():
    s = settings()
    data, static, cam = presets.default_scene(resolution=s.resolution)
    mesh = sharding.make_mesh()
    got = film_mod.resolve(
        sharding.render_frame_sharded(data, static, s, cam, frame=1,
                                      mesh=mesh), s.resolution)
    assert np.isfinite(got.color).all()
    assert got.alpha.mean() > 0.05


def test_sharded_checkpoint_kill_resume(tmp_path):
    """Multi-chip preemption recovery (round-3 verdict item 5): a sharded
    render killed mid-frame via the fault hook is retried by
    render_frame_resilient, resumes at the last persisted pass ON THE
    MESH, and produces the bit-exact film of an uninterrupted sharded
    render (the psum-merged film is replicated, so the single-chip
    checkpoint format applies unchanged)."""
    import dataclasses
    # 768 total rays; per_dev=24 over 8 devices -> 192/pass -> 4 passes
    s = dataclasses.replace(settings(), rays_per_pass=24)
    data, static, cam = presets.spheres_scene(resolution=s.resolution)
    mesh = sharding.make_mesh()
    ref = sharding.render_frame_sharded(data, static, s, cam, frame=1,
                                        mesh=mesh)

    calls = {"n": 0, "resumed_at": None}

    def bomb(p):
        calls["n"] += 1
        if calls["n"] == 2:  # die after completing pass index 1
            raise RuntimeError("injected preemption")
        if calls["n"] == 3:
            calls["resumed_at"] = p

    path = str(tmp_path / "ck.npz")
    renderer._FAIL_HOOK = bomb
    try:
        film = renderer.render_frame_resilient(
            data, static, s, cam, frame=1, retries=1, mesh=mesh,
            checkpoint_path=path, checkpoint_every=1)
    finally:
        renderer._FAIL_HOOK = None

    assert calls["resumed_at"] == 1, calls
    np.testing.assert_array_equal(np.asarray(film.samples),
                                  np.asarray(ref.samples))
    np.testing.assert_array_equal(np.asarray(film.color),
                                  np.asarray(ref.color))


def test_frames_per_chip_checkpoint_skip_and_resume(tmp_path):
    """Frame-farm elastic recovery: finished frames are persisted per
    frame and skipped on restart; the restart renders only the missing
    frames and the full result matches the sequential path."""
    s = settings()
    data, static, cam = presets.spheres_scene(resolution=s.resolution)
    ckdir = str(tmp_path / "farm")
    frames = list(range(1, 11))  # 10 frames over 8 devices -> 8 + 2

    boom = {"chunks": 0}

    def die_after_first_chunk(done, total):
        boom["chunks"] += 1
        if boom["chunks"] == 1:
            raise KeyboardInterrupt

    try:
        sharding.render_frames_per_chip(
            data, static, s, cam, frames, checkpoint_dir=ckdir,
            progress=die_after_first_chunk)
        raised = False
    except KeyboardInterrupt:
        raised = True
    assert raised

    progressed = []
    films = sharding.render_frames_per_chip(
        data, static, s, cam, frames, checkpoint_dir=ckdir,
        progress=lambda done, total: progressed.append((done, total)))
    # first chunk (8 frames) was resumed from disk: only 1 chunk left
    assert progressed == [(10, 10)]
    ref = renderer.render_frame(data, static, s, cam, frame=10)
    np.testing.assert_array_equal(np.asarray(films[-1].color),
                                  np.asarray(ref.color))


def test_fused_kernels_under_shard_map(monkeypatch):
    """Round-3 verdict item 4: exercise the FUSED Pallas path (interpret
    mode) under shard_map on the 8-device mesh — the code path a real
    multi-chip slice would run — and require equality with the
    single-device fused render (same rays, psum reduction order only)."""
    import jax.numpy as jnp
    from rayn_tpu.ops import filters as filter_ops
    from rayn_tpu.ops import intersect_pallas, shade_pallas
    from rayn_tpu.utils import rng

    monkeypatch.setattr(shade_pallas, "INTERPRET", True)
    monkeypatch.setattr(intersect_pallas, "INTERPRET", True)

    s = settings()
    data, static, cam = presets.default_scene(resolution=s.resolution)
    assert shade_pallas.fused_ok(s, static, data)
    assert intersect_pallas.fused_intersect_ok(s, static, data)

    tables = rng.build_sample_tables(s, frame=1)
    fis = filter_ops.build_fis_table(filter_ops.blackman_harris(1.5),
                                     s.filter_table_size)
    w, h = s.resolution
    rays = w * h * s.spp
    mesh = sharding.make_mesh()
    per_dev = rays // mesh.devices.size
    t0, t1 = jnp.float32(1 / 24), jnp.float32(2 / 24)

    film = sharding.render_pass_sharded(
        mesh, film_mod.new_film(w * h), data, static, s, tables, cam, fis,
        jnp.int32(0), per_dev, t0, t1)
    ref = renderer.render_pass(
        film_mod.new_film(w * h), data, static, s, tables, cam, fis,
        jnp.int32(0), rays, t0, t1)
    np.testing.assert_array_equal(np.asarray(film.samples),
                                  np.asarray(ref.samples))
    np.testing.assert_allclose(np.asarray(film.color),
                               np.asarray(ref.color), atol=2e-5)
    np.testing.assert_allclose(np.asarray(film.normal),
                               np.asarray(ref.normal), atol=2e-5)
