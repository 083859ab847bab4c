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
