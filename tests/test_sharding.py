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
