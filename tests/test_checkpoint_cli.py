"""Checkpoint/resume and CLI tests."""

import numpy as np

from rayn_tpu.config import RenderSettings
from rayn_tpu.render import checkpoint, film as film_mod, renderer
from rayn_tpu.scene import presets


def small():
    return RenderSettings(resolution=(16, 12), spp=4, max_bounces=1,
                          volume_marches=1, max_marches=16,
                          max_vis_marches=8, rays_per_pass=128)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        s = small()
        f = film_mod.new_film(16 * 12)
        path = str(tmp_path / "ck.npz")
        checkpoint.save(path, f, s, frame=1, next_pass=3)
        loaded = checkpoint.load(path, s, frame=1)
        assert loaded is not None
        film2, next_pass = loaded
        assert next_pass == 3
        np.testing.assert_array_equal(np.asarray(film2.color),
                                      np.asarray(f.color))

    def test_fingerprint_mismatch_refused(self, tmp_path):
        s = small()
        f = film_mod.new_film(16 * 12)
        path = str(tmp_path / "ck.npz")
        checkpoint.save(path, f, s, frame=1, next_pass=3)
        assert checkpoint.load(path, s, frame=2) is None
        s2 = RenderSettings(resolution=(16, 12), spp=8)
        assert checkpoint.load(path, s2, frame=1) is None

    def test_scene_or_camera_mismatch_refused(self, tmp_path):
        """A checkpoint written for scene A must not resume into a
        render of scene B (or another camera/shutter) — the blend would
        silently corrupt the image (ADVICE.md round 1, medium)."""
        s = small()
        data_a, _, cam_a = presets.spheres_scene(resolution=s.resolution)
        data_b, _, cam_b = presets.default_scene(resolution=s.resolution)
        f = film_mod.new_film(16 * 12)
        path = str(tmp_path / "ck.npz")
        checkpoint.save(path, f, s, frame=1, next_pass=2, scene=data_a,
                        camera=cam_a, time_range=(0.0, 1.0 / 24.0))
        ok = checkpoint.load(path, s, frame=1, scene=data_a, camera=cam_a,
                             time_range=(0.0, 1.0 / 24.0))
        assert ok is not None
        assert checkpoint.load(path, s, frame=1, scene=data_b, camera=cam_a,
                               time_range=(0.0, 1.0 / 24.0)) is None
        assert checkpoint.load(path, s, frame=1, scene=data_a, camera=cam_b,
                               time_range=(0.0, 1.0 / 24.0)) is None
        assert checkpoint.load(path, s, frame=1, scene=data_a, camera=cam_a,
                               time_range=(0.0, 2.0 / 24.0)) is None

    def test_progressive_spp_growth(self, tmp_path):
        """Re-running with a higher spp against an existing checkpoint
        renders ONLY the missing per-pixel sample indices and produces
        the same film as a flat high-spp render (f32 accumulation order
        aside) — the reference's progressive_epoch scaffolding realized
        (src/film.rs:178)."""
        import dataclasses
        s2 = dataclasses.replace(small(), spp=2)
        s4 = dataclasses.replace(small(), spp=4)
        data, static, cam = presets.spheres_scene(resolution=(16, 12))
        path = str(tmp_path / "ck.npz")

        renderer.render_frame(data, static, s2, cam, frame=1,
                              checkpoint_path=path, checkpoint_every=1)

        passes = []
        grown = renderer.render_frame(
            data, static, s4, cam, frame=1, checkpoint_path=path,
            checkpoint_every=1,
            progress=lambda done, total: passes.append((done, total)))
        # total work = 16*12*4 = 768 rays; the grow run rendered only
        # the extension segment (384 rays = 3 passes at 128/pass),
        # resuming its progress at the checkpointed half
        assert passes[0][0] > 384 and passes[-1] == (768, 768)
        assert len(passes) == 3

        ref = renderer.render_frame(data, static, s4, cam, frame=1)
        np.testing.assert_array_equal(np.asarray(grown.samples),
                                      np.asarray(ref.samples))
        np.testing.assert_allclose(np.asarray(grown.color),
                                   np.asarray(ref.color), atol=1e-5)
        np.testing.assert_allclose(np.asarray(grown.normal),
                                   np.asarray(ref.normal), atol=1e-5)

    def test_progressive_growth_interrupted_midway(self, tmp_path):
        """A grow run killed inside the extension segment resumes inside
        that segment (not from sample 0) and still converges to the flat
        render."""
        import dataclasses
        s2 = dataclasses.replace(small(), spp=2)
        s4 = dataclasses.replace(small(), spp=4)
        data, static, cam = presets.spheres_scene(resolution=(16, 12))
        path = str(tmp_path / "ck.npz")
        renderer.render_frame(data, static, s2, cam, frame=1,
                              checkpoint_path=path, checkpoint_every=1)

        calls = {"n": 0}

        def bomb(p):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected preemption")

        renderer._FAIL_HOOK = bomb
        try:
            film = renderer.render_frame_resilient(
                data, static, s4, cam, frame=1, retries=1,
                checkpoint_path=path, checkpoint_every=1)
        finally:
            renderer._FAIL_HOOK = None
        ref = renderer.render_frame(data, static, s4, cam, frame=1)
        np.testing.assert_array_equal(np.asarray(film.samples),
                                      np.asarray(ref.samples))
        np.testing.assert_allclose(np.asarray(film.color),
                                   np.asarray(ref.color), atol=1e-5)

    def test_shrunk_spp_returns_richer_film(self, tmp_path):
        """A checkpoint holding MORE samples than requested is returned
        as-is (extra samples only sharpen the estimate)."""
        import dataclasses
        s4 = dataclasses.replace(small(), spp=4)
        s2 = dataclasses.replace(small(), spp=2)
        data, static, cam = presets.spheres_scene(resolution=(16, 12))
        path = str(tmp_path / "ck.npz")
        ref = renderer.render_frame(data, static, s4, cam, frame=1,
                                    checkpoint_path=path)
        got = renderer.render_frame(data, static, s2, cam, frame=1,
                                    checkpoint_path=path)
        np.testing.assert_array_equal(np.asarray(got.samples),
                                      np.asarray(ref.samples))

    def test_resume_produces_identical_film(self, tmp_path):
        s = small()
        data, static, cam = presets.spheres_scene(resolution=s.resolution)
        ref = renderer.render_frame(data, static, s, cam, frame=1)

        # Render with checkpointing every pass, stop after 2 passes by
        # saving, then resume from the checkpoint.
        path = str(tmp_path / "ck.npz")
        total = 16 * 12 * 4
        n_passes = -(-total // s.rays_per_pass)
        assert n_passes >= 4

        calls = []

        def interrupt(done, total):
            calls.append(done)
            if len(calls) == 2:
                raise KeyboardInterrupt

        try:
            renderer.render_frame(data, static, s, cam, frame=1,
                                  checkpoint_path=path, checkpoint_every=1,
                                  progress=interrupt)
            raised = False
        except KeyboardInterrupt:
            raised = True
        assert raised

        resumed = renderer.render_frame(data, static, s, cam, frame=1,
                                        checkpoint_path=path,
                                        checkpoint_every=1)
        np.testing.assert_allclose(np.asarray(resumed.color),
                                   np.asarray(ref.color), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(resumed.samples),
                                      np.asarray(ref.samples))


class TestCli:
    def test_render_tiny_frame(self, tmp_path, capsys):
        from rayn_tpu import cli
        rc = cli.main([
            "--scene", "spheres", "--width", "24", "--height", "16",
            "--spp", "2", "--bounces", "1", "--max-marches", "8",
            "--frames", "1", "2", "--out", str(tmp_path),
            "--channels", "color", "alpha", "--rays-per-pass", "512",
        ])
        assert rc == 0
        assert (tmp_path / "frame0001_2spp_color.png").exists()
        assert (tmp_path / "frame0001_2spp_alpha.png").exists()

    def test_parser_covers_reference_knobs(self):
        from rayn_tpu import cli
        p = build = cli.build_parser()
        args = p.parse_args([])
        # reference defaults: 1280x720, 8 spp effective, 3 bounces,
        # 2 volume marches, frames 1..2, BH filter radius 1.5
        assert (args.width, args.height) == (1280, 720)
        assert args.spp == 8 and args.bounces == 3
        assert args.volume_marches == 2
        assert tuple(args.frames) == (1, 2)
        assert args.filter == "blackman_harris"
        assert args.filter_radius == 1.5


class TestResilient:
    def test_retry_resumes_from_checkpoint(self, tmp_path):
        """Failure detection + elastic resume: a render killed mid-frame
        is retried and resumes at the last persisted pass, producing the
        exact image of an uninterrupted render."""
        s = small()  # 16*12*4 = 768 rays, rays_per_pass=128 -> 6 passes
        data, static, camera = presets.spheres_scene(resolution=(16, 12))
        ref = renderer.render_frame(data, static, s, camera, frame=1)

        calls = {"n": 0, "resumed_at": None}

        def bomb(p):
            calls["n"] += 1
            if calls["n"] == 3:  # die after completing pass index 2
                raise RuntimeError("injected preemption")
            if calls["n"] == 4:
                calls["resumed_at"] = p

        path = str(tmp_path / "ck.npz")
        renderer._FAIL_HOOK = bomb
        try:
            film = renderer.render_frame_resilient(
                data, static, s, camera, frame=1, retries=1,
                checkpoint_path=path, checkpoint_every=1)
        finally:
            renderer._FAIL_HOOK = None

        # the retry resumed at the failed pass, not at ray 0
        assert calls["resumed_at"] == 2, calls
        np.testing.assert_array_equal(np.asarray(film.samples),
                                      np.asarray(ref.samples))
        np.testing.assert_allclose(np.asarray(film.color),
                                   np.asarray(ref.color), atol=1e-6)

    def test_retries_exhausted_reraises(self):
        s = small()
        data, static, camera = presets.spheres_scene(resolution=(16, 12))

        def always(p):
            raise RuntimeError("hard failure")

        renderer._FAIL_HOOK = always
        try:
            import pytest
            with pytest.raises(RuntimeError, match="hard failure"):
                renderer.render_frame_resilient(
                    data, static, s, camera, frame=1, retries=2)
        finally:
            renderer._FAIL_HOOK = None
