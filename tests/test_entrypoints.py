"""Driver entry points and animated-preset smoke tests (on the virtual
CPU mesh from conftest)."""

import numpy as np


def test_entry_compiles_and_runs():
    import jax
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert float(out.samples.sum()) > 0


def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(4)


def test_animated_camera_preset_renders():
    from rayn_tpu.config import RenderSettings
    from rayn_tpu.render import film as film_mod, renderer
    from rayn_tpu.scene import presets

    s = RenderSettings(resolution=(16, 12), spp=4, max_bounces=1,
                       volume_marches=1, max_marches=12, max_vis_marches=8,
                       rays_per_pass=1 << 10)
    data, static, cam = presets.default_scene(resolution=(16, 12),
                                              animated=True)
    # two frames at different times see a moved camera
    a = film_mod.resolve(
        renderer.render_frame(data, static, s, cam, frame=1,
                              time_range=(0.0, 0.05)), (16, 12))
    b = film_mod.resolve(
        renderer.render_frame(data, static, s, cam, frame=1,
                              time_range=(1.5, 1.55)), (16, 12))
    assert np.isfinite(a.color).all() and np.isfinite(b.color).all()
    assert not np.allclose(a.alpha, b.alpha)


def test_cli_multichip(tmp_path):
    from rayn_tpu import cli
    rc = cli.main([
        "--scene", "spheres", "--width", "16", "--height", "12",
        "--spp", "2", "--bounces", "1", "--max-marches", "8",
        "--frames", "1", "2", "--out", str(tmp_path),
        "--channels", "color", "--rays-per-pass", "256", "--multichip",
    ])
    assert rc == 0
    assert (tmp_path / "frame0001_2spp_color.png").exists()


def test_cli_multichip_frames_mode(tmp_path):
    """--multichip with 2+ frames deals frames out one-per-chip
    (BASELINE config #5) and writes every frame's PNGs."""
    from rayn_tpu import cli
    rc = cli.main([
        "--scene", "spheres", "--width", "16", "--height", "12",
        "--spp", "2", "--bounces", "1", "--max-marches", "8",
        "--frames", "1", "4", "--out", str(tmp_path),
        "--channels", "color", "--rays-per-pass", "256", "--multichip",
    ])
    assert rc == 0
    for f in (1, 2, 3):
        assert (tmp_path / f"frame{f:04d}_2spp_color.png").exists()


def test_cli_thinlens_and_ortho_cameras(tmp_path):
    """DoF and orthographic cameras are reachable end-to-end from the
    CLI (reference offers them in code, src/camera.rs:120-285)."""
    from rayn_tpu import cli
    for cam, extra in (
            ("thinlens", ["--aperture", "0.2", "--focus", "0", "0", "0"]),
            ("ortho", ["--ortho-height", "3.0"])):
        rc = cli.main([
            "--scene", "spheres", "--width", "16", "--height", "12",
            "--spp", "2", "--bounces", "1", "--max-marches", "8",
            "--frames", "1", "2", "--out", str(tmp_path / cam),
            "--channels", "color", "--rays-per-pass", "256",
            "--camera", cam, *extra,
        ])
        assert rc == 0
        assert (tmp_path / cam / "frame0001_2spp_color.png").exists()
    # the two cameras see different images
    from PIL import Image
    a = np.asarray(Image.open(tmp_path / "thinlens"
                              / "frame0001_2spp_color.png"))
    b = np.asarray(Image.open(tmp_path / "ortho"
                              / "frame0001_2spp_color.png"))
    assert not np.array_equal(a, b)
