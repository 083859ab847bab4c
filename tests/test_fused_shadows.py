"""Fused shadow kernel (ops/shade_pallas.py) vs the unfused segment-queue
path: identical sampler streams, same formulas, so per-bounce radiance
must agree to f32 association tolerance and all other PathState fields
must be bit-identical (steps 5-7 are shared code)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import filters as filter_ops
from rayn_tpu.ops import shade_pallas
from rayn_tpu.render import renderer
from rayn_tpu.render.integrator import bounce, init_state
from rayn_tpu.scene import presets
from rayn_tpu.utils import rng


@pytest.fixture
def interpret_fused(monkeypatch):
    monkeypatch.setattr(shade_pallas, "INTERPRET", True)


def _states(settings, data, static, camera, n):
    tables = rng.build_sample_tables(settings, frame=1)
    fis = filter_ops.build_fis_table(filter_ops.blackman_harris(1.5),
                                     settings.filter_table_size)
    t0, t1 = jnp.float32(1 / 24), jnp.float32(2 / 24)
    ray_idx = renderer.ray_indices(jnp.int32(0), n)
    origin, direction, tm, pixel, sample_idx, in_range = \
        renderer.generate_rays(settings, tables, camera, fis, ray_idx,
                               t0, t1)
    hps = camera.half_pixel_size_coeffs()
    return (init_state(origin, direction, tm, pixel, sample_idx, in_range),
            tables, hps)


def _run_bounces(settings, data, static, camera, n, depths=(0, 1)):
    state, tables, (hps_abs0, hps_lin0) = _states(
        settings, data, static, camera, n)
    out = []
    for depth in range(max(depths) + 1):
        state = bounce(data, static, settings, tables, state, depth,
                       hps_abs0, hps_lin0)
        if depth in depths:
            out.append(state)
    return out


@pytest.mark.parametrize("volume", [True, False])
def test_fused_matches_unfused(interpret_fused, volume):
    n = 512
    res = (32, 32)
    # use_fused_shadows defaults ON — the plain arm must disable it
    # explicitly or the comparison is fused-vs-fused (vacuous)
    base = RenderSettings(resolution=res, spp=4, max_marches=64,
                          max_vis_marches=48, rays_per_pass=n,
                          use_fused_shadows=False)
    data, static, camera = presets.default_scene(resolution=res,
                                                 volume=volume)

    plain = _run_bounces(base, data, static, camera, n)
    fused = _run_bounces(
        dataclasses.replace(base, use_fused_shadows=True),
        data, static, camera, n)

    for d, (a, b) in enumerate(zip(plain, fused)):
        ra, rb = np.asarray(a.radiance), np.asarray(b.radiance)
        close = np.isclose(ra, rb, rtol=2e-4, atol=2e-5)
        # The fused kernel re-associates the f32 segment arithmetic, so a
        # grazing shadow segment can flip visibility on O(1e-3) of lanes
        # (same magnitude as the pallas-vs-jnp occlusion agreement,
        # tools/perf_occl.py agree_jnp=0.999999); everything else must
        # match tightly.
        frac = 1.0 - close.mean()
        assert frac < 1.5e-2, (
            f"radiance mismatch beyond visibility-flip rate at depth {d} "
            f"(volume={volume}): {frac:.4f} of elements, "
            f"max |d|={np.abs(ra - rb).max()}")
        # each flip adds/removes at most one shadow segment's contribution
        assert np.abs(ra - rb).max() < 0.1
        # At depth >= 1 an ulp-level difference in a depth-0 scatter
        # direction amplifies chaotically through the fractal (different
        # hit point => different shading on that lane), so throughput and
        # alive are gated on the fraction of diverged lanes.
        ta, tb = np.asarray(a.throughput), np.asarray(b.throughput)
        tfrac = 1.0 - np.isclose(ta, tb, rtol=1e-4, atol=1e-5).mean()
        assert tfrac < (1e-3 if d == 0 else 3e-2), (
            f"throughput diverged on {tfrac:.4f} of elements at depth {d}")
        afrac = (np.asarray(a.alive) != np.asarray(b.alive)).mean()
        assert afrac < (1e-3 if d == 0 else 1e-2)
        np.testing.assert_array_equal(np.asarray(a.pixel),
                                      np.asarray(b.pixel))


def test_fused_render_matches_image(interpret_fused):
    """Whole-frame comparison: individual visibility flips wash out in
    the per-pixel mean, so the fused and unfused images must agree to
    well under the oracle gate's tolerance."""
    from rayn_tpu.render import film as film_mod

    res = (20, 20)
    base = RenderSettings(resolution=res, spp=8, max_marches=48,
                          max_vis_marches=40,
                          rays_per_pass=res[0] * res[1] * 8)
    data, static, camera = presets.default_scene(resolution=res)
    imgs = []
    for fused in (False, True):
        settings = dataclasses.replace(base, use_fused_shadows=fused)
        film = renderer.render_frame(data, static, settings, camera,
                                     frame=1)
        imgs.append(np.asarray(film_mod.resolve(film, res).color))
    rmse = np.sqrt(np.mean((imgs[0] - imgs[1]) ** 2))
    # ulp-level scatter-direction differences decorrelate chaotic lanes
    # (fractal hits) like a seed change: ~5e-4 noise floor at 8 spp here;
    # a systematic kernel bug measures >> 1e-2
    assert rmse < 1.5e-3, f"fused-vs-unfused image RMSE {rmse}"


def test_fused_no_sdf_scene_matches(interpret_fused):
    """spheres_scene has no SDF: the fused kernel skips the shadow march
    (sphere occlusion only) and must still match the unfused path."""
    n = 512
    res = (16, 16)
    base = RenderSettings(resolution=res, spp=2, rays_per_pass=n,
                          use_fused_shadows=False)
    data, static, camera = presets.spheres_scene(resolution=res)
    assert shade_pallas.fused_ok(
        dataclasses.replace(base, use_fused_shadows=True),
        static, data)
    plain = _run_bounces(base, data, static, camera, n, depths=(0, 1))
    fused = _run_bounces(
        dataclasses.replace(base, use_fused_shadows=True),
        data, static, camera, n, depths=(0, 1))
    for d, (a, b) in enumerate(zip(plain, fused)):
        ra, rb = np.asarray(a.radiance), np.asarray(b.radiance)
        close = np.isclose(ra, rb, rtol=2e-4, atol=2e-5)
        assert (1.0 - close.mean()) < 1.5e-2, f"depth {d}"
        np.testing.assert_array_equal(np.asarray(a.alive),
                                      np.asarray(b.alive))


def test_fused_animated_geo_matches_unfused(interpret_fused):
    """Multi-knot light/sphere channels (orbiting sphere lights) run
    through the fused kernels (round-3: knots live in SMEM, lerped
    in-kernel at each lane's time) and must match the unfused path."""
    import jax
    from rayn_tpu.ops import intersect_pallas

    n = 512
    res = (16, 16)
    base = RenderSettings(resolution=res, spp=2, max_marches=48,
                          max_vis_marches=32, rays_per_pass=n,
                          use_fused_shadows=False)
    data, static, camera = presets.default_scene(resolution=res,
                                                 animated_geo=True)
    assert int(data.light_pos.values.shape[1]) > 1  # actually animated
    assert shade_pallas.fused_ok(
        dataclasses.replace(base, use_fused_shadows=True),
        static, data)
    assert float(jnp.max(data.light_paired)) == 1.0  # pairing survived

    plain = _run_bounces(base, data, static, camera, n, depths=(0, 1))
    fused = _run_bounces(
        dataclasses.replace(base, use_fused_shadows=True),
        data, static, camera, n, depths=(0, 1))
    for d, (a, b) in enumerate(zip(plain, fused)):
        ra, rb = np.asarray(a.radiance), np.asarray(b.radiance)
        close = np.isclose(ra, rb, rtol=2e-4, atol=2e-5)
        frac = 1.0 - close.mean()
        assert frac < 1.5e-2, (
            f"animated-geo radiance mismatch at depth {d}: {frac:.4f}, "
            f"max |d|={np.abs(ra - rb).max()}")


def test_fused_mis_matches_unfused(interpret_fused):
    """mis=True runs through the fused kernels (round-3: the NEE
    power-heuristic weight and the BSDF-hit emission weight are in-kernel)
    and must match the unfused MIS path. default_scene auto-pairs its
    co-located emissive spheres, so both weights are exercised."""
    n = 512
    res = (16, 16)
    base = RenderSettings(resolution=res, spp=4, max_marches=48,
                          max_vis_marches=32, rays_per_pass=n, mis=True,
                          use_fused_shadows=False)
    data, static, camera = presets.default_scene(resolution=res)
    assert shade_pallas.fused_ok(
        dataclasses.replace(base, use_fused_shadows=True),
        static, data)
    assert float(jnp.max(data.light_paired)) == 1.0  # pairs exist

    plain = _run_bounces(base, data, static, camera, n, depths=(0, 1, 2))
    fused = _run_bounces(
        dataclasses.replace(base, use_fused_shadows=True),
        data, static, camera, n, depths=(0, 1, 2))
    for d, (a, b) in enumerate(zip(plain, fused)):
        ra, rb = np.asarray(a.radiance), np.asarray(b.radiance)
        close = np.isclose(ra, rb, rtol=2e-4, atol=2e-5)
        frac = 1.0 - close.mean()
        # The MIS weights contain cos_alpha^power (power up to ~300),
        # which amplifies 1-ulp association differences into O(10%)
        # weight changes on a few %% of lanes — per-lane decorrelation,
        # not bias (the image-level gate below and bench --selftest's
        # seed-swap null hold the bias to the MC noise floor).
        assert frac < (1.5e-2 if d == 0 else 5e-2), (
            f"mis radiance mismatch at depth {d}: {frac:.4f}, "
            f"max |d|={np.abs(ra - rb).max()}")
        afrac = (np.asarray(a.alive) != np.asarray(b.alive)).mean()
        assert afrac < (1e-3 if d == 0 else 1e-2)


def test_fused_mis_render_matches_image(interpret_fused):
    """Whole-frame MIS comparison: the per-lane weight decorrelation must
    wash out in the per-pixel mean (measured 5.3e-4 RMSE, 3.5e-4 mean-rel
    at 8 spp — the MC noise floor; a weight bug measures >> 1e-2)."""
    from rayn_tpu.render import film as film_mod

    res = (20, 20)
    base = RenderSettings(resolution=res, spp=8, max_marches=48,
                          max_vis_marches=40, mis=True,
                          rays_per_pass=res[0] * res[1] * 8)
    data, static, camera = presets.default_scene(resolution=res)
    imgs = []
    for fused in (False, True):
        settings = dataclasses.replace(base, use_fused_shadows=fused)
        film = renderer.render_frame(data, static, settings, camera,
                                     frame=1)
        imgs.append(np.asarray(film_mod.resolve(film, res).color))
    rmse = np.sqrt(np.mean((imgs[0] - imgs[1]) ** 2))
    mrel = abs(imgs[0].mean() - imgs[1].mean()) / imgs[0].mean()
    assert rmse < 1.5e-3, f"MIS fused-vs-unfused image RMSE {rmse}"
    assert mrel < 1.5e-3, f"MIS fused-vs-unfused mean-rel {mrel}"


def test_bounce_tail_megakernel_matches_two_kernel(interpret_fused):
    """The whole-tail mega-kernel (bounce_tail_fused) vs the two-kernel
    path (shadow_radiance + finish_bounce_fused): identical op sequence,
    so in interpret mode every PathState field must match bit-for-bit
    (the only difference is where the radiance delta lives — registers
    vs an HBM round trip)."""
    n = 512
    res = (16, 16)
    base = RenderSettings(resolution=res, spp=2, max_marches=48,
                          max_vis_marches=32, rays_per_pass=n,
                          use_fused_bounce_tail=False)
    data, static, camera = presets.default_scene(resolution=res)
    prog = static.sdf_program(data)
    assert shade_pallas.fused_ok(base, static, data)

    two = _run_bounces(base, data, static, camera, n, depths=(0, 1, 2))
    one = _run_bounces(
        dataclasses.replace(base, use_fused_bounce_tail=True),
        data, static, camera, n, depths=(0, 1, 2))
    for d, (a, b) in enumerate(zip(two, one)):
        for field in a._fields:
            va, vb = np.asarray(getattr(a, field)), \
                np.asarray(getattr(b, field))
            np.testing.assert_array_equal(
                va, vb, err_msg=f"{field} differs at depth {d}")


def test_bounce_tail_megakernel_mis_animated(interpret_fused):
    """Mega-kernel with both round-3 widenings active at once (MIS +
    multi-knot animated channels) vs the two-kernel path."""
    n = 256
    res = (16, 16)
    base = RenderSettings(resolution=res, spp=2, max_marches=32,
                          max_vis_marches=24, rays_per_pass=n, mis=True,
                          use_fused_bounce_tail=False)
    data, static, camera = presets.default_scene(resolution=res,
                                                 animated_geo=True)
    prog = static.sdf_program(data)
    assert shade_pallas.fused_ok(base, static, data)

    two = _run_bounces(base, data, static, camera, n, depths=(0, 1))
    one = _run_bounces(
        dataclasses.replace(base, use_fused_bounce_tail=True),
        data, static, camera, n, depths=(0, 1))
    for d, (a, b) in enumerate(zip(two, one)):
        for field in a._fields:
            va, vb = np.asarray(getattr(a, field)), \
                np.asarray(getattr(b, field))
            np.testing.assert_array_equal(
                va, vb, err_msg=f"{field} differs at depth {d}")


def test_fallback_warns_once(interpret_fused):
    """An eligibility-cliff fallback must warn (round-2 verdict: silent
    ~2x cliffs) — and only once per (feature, reason) per process."""
    import warnings

    res = (16, 16)
    settings = RenderSettings(resolution=res, spp=1, rays_per_pass=256,
                              march_relaxation=1.4,
                              use_fused_shadows=True)
    data, static, camera = presets.default_scene(resolution=res)
    prog = static.sdf_program(data)

    shade_pallas._WARNED.clear()
    with pytest.warns(RuntimeWarning, match="march_relaxation"):
        assert not shade_pallas.fused_ok(settings, static, data)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a second warning would raise
        assert not shade_pallas.fused_ok(settings, static, data)

    # knot limits are GONE (round-5): a 9-knot sphere channel is fully
    # eligible — animated centers are resolved outside the kernels
    many = presets.default_scene(resolution=res, animated_geo=True,
                                 geo_knots=9)
    mdata, mstatic, _ = many
    shade_pallas.INTERPRET = True
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            assert shade_pallas.fused_ok(
                RenderSettings(resolution=res, spp=1, rays_per_pass=256),
                mstatic, mdata)
    finally:
        shade_pallas.INTERPRET = False


def test_fused_chained_bit_identical_to_sequential(interpret_fused):
    """chained_shadow_march reschedules the fused kernel's 12 shadow
    marches (one chained loop instead of 12 sequential block-max loops)
    without touching any segment's step sequence or the contribution
    accumulation order — the whole PathState must be BIT-identical."""
    n = 512
    res = (32, 32)
    base = RenderSettings(resolution=res, spp=4, max_marches=64,
                          max_vis_marches=48, rays_per_pass=n,
                          use_fused_shadows=True,
                          chained_shadow_march=False)
    data, static, camera = presets.default_scene(resolution=res)

    seq = _run_bounces(base, data, static, camera, n, depths=(0, 1))
    cha = _run_bounces(
        dataclasses.replace(base, chained_shadow_march=True),
        data, static, camera, n, depths=(0, 1))
    for d, (a, b) in enumerate(zip(seq, cha)):
        for field in ("radiance", "throughput", "origin", "direction",
                      "alive", "pixel", "sample_idx"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, field)),
                np.asarray(getattr(b, field)),
                err_msg=f"{field} differs at depth {d}")


def test_unfused_chained_segments_route_matches():
    """The unfused batched occlusion call with segments=k (the
    integrator's layout) must give bit-identical visibility whether the
    chained route is taken or not. On CPU the Pallas route is gated
    off, so drive march_occlusion_chained directly against the flat
    jnp march on the same segment-major queue."""
    import jax.numpy as jnp
    from rayn_tpu.ops import march as march_ops
    from rayn_tpu.ops import march_pallas, sdf as sdf_ops

    prog = sdf_ops.mandelbox(6, 1.0, 0.01, 1.9, -2.1)
    rng = np.random.default_rng(11)
    k, nseg = 12, 300
    start = jnp.asarray(rng.uniform(-3, 3, (k * nseg, 3)).astype(np.float32))
    end = start + jnp.asarray(rng.normal(size=(k * nseg, 3)).astype(np.float32))
    active = jnp.asarray(rng.uniform(size=k * nseg) < 0.6)
    flat = np.asarray(march_ops.march_occlusion(
        prog, start, end, 0.5, 48, active=active, bound_radius=3.6))
    chained = np.asarray(march_pallas.march_occlusion_chained(
        prog, start.reshape(k, nseg, 3), end.reshape(k, nseg, 3), 0.5,
        48, active.reshape(k, nseg), interpret=True,
        bound_radius=3.6)).reshape(-1)
    np.testing.assert_array_equal(flat, chained)


def test_sorted_shadow_march_bit_identical(interpret_fused):
    """sorted_shadow_march payload-sorts the wavefront by the cost key
    before the fused bounce tail and unsorts after — block membership
    is the only thing that changes, so the whole PathState must be
    BIT-identical, at every depth, for both fused paths."""
    n = 512
    res = (32, 32)
    for tail in (True, False):
        base = RenderSettings(resolution=res, spp=4, max_marches=64,
                              max_vis_marches=48, rays_per_pass=n,
                              use_fused_shadows=True,
                              use_fused_bounce_tail=tail,
                              sorted_shadow_march=False)
        data, static, camera = presets.default_scene(resolution=res)
        plain = _run_bounces(base, data, static, camera, n,
                             depths=(0, 1, 2))
        srt = _run_bounces(
            dataclasses.replace(base, sorted_shadow_march=True),
            data, static, camera, n, depths=(0, 1, 2))
        for d, (a, b) in enumerate(zip(plain, srt)):
            for field in ("radiance", "throughput", "origin",
                          "direction", "alive", "pixel", "sample_idx",
                          "prev_pdf", "color_out", "bg_out",
                          "alpha_out", "normal_out", "time"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, field)),
                    np.asarray(getattr(b, field)),
                    err_msg=f"{field} differs at depth {d} tail={tail}")


def test_sorted_indivisible_pass_warns_and_skips(interpret_fused):
    """A pass size no supported sort chunk divides must NOT silently
    fall back to the chunk=1 per-lane permutation (a measured 95 ms/M
    pathology, tools/perf_sorted_decomp.py): it warns once and renders
    unsorted — bit-identical output either way (round-4 verdict weak
    #6)."""
    n = 500  # 500 % 8 != 0: no supported chunk divides it
    res = (25, 25)
    base = RenderSettings(resolution=res, spp=1, max_marches=64,
                          max_vis_marches=48, rays_per_pass=n,
                          sorted_shadow_march=False,
                          sorted_intersect=False)
    data, static, camera = presets.default_scene(resolution=res)
    plain = _run_bounces(base, data, static, camera, n, depths=(1,))

    shade_pallas._WARNED.clear()
    with pytest.warns(RuntimeWarning, match="sort chunk"):
        srt = _run_bounces(
            dataclasses.replace(base, sorted_shadow_march=True,
                                sorted_intersect=True),
            data, static, camera, n, depths=(1,))
    for a, b in zip(plain, srt):
        for field in ("radiance", "throughput", "alive", "color_out"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, field)),
                np.asarray(getattr(b, field)), err_msg=field)


def test_shadow_sort_key_prices_segments(interpret_fused):
    """The cost key must be finite, >= 1 per segment (inactive segments
    still cost one chain iteration), and larger for rays whose shadow
    chains actually march."""
    import jax.numpy as jnp
    from rayn_tpu.render.integrator import bounce as _  # noqa: F401
    from rayn_tpu.render import renderer
    from rayn_tpu.render.integrator import init_state
    from rayn_tpu.ops import intersect

    n = 512
    res = (32, 32)
    s = RenderSettings(resolution=res, spp=4, max_marches=64,
                       max_vis_marches=48, rays_per_pass=n)
    data, static, camera = presets.default_scene(resolution=res)
    state, tables, (ha, hl) = _states(s, data, static, camera, n)
    hit = intersect.closest_hit(
        data, static, s, state.origin, state.direction, state.time,
        jnp.full((n,), 2.0 * s.world_radius), jnp.broadcast_to(ha, (n,)),
        jnp.broadcast_to(hl, (n,)), state.alive)
    info = intersect.shading_info(data, static, s, hit, state.origin,
                                  state.direction, state.time,
                                  jnp.broadcast_to(ha, (n,)),
                                  jnp.broadcast_to(hl, (n,)))
    from rayn_tpu.ops import bsdf as bsdf_ops
    live = state.alive & hit.valid
    mat = bsdf_ops.gather(data.materials, info.mat)
    receives = bsdf_ops.receives_light(mat) & live
    from rayn_tpu.render.integrator import _equi_angular_samples
    vd, _vp = _equi_angular_samples(data, static, s, tables, state, hit, 0)
    key = np.asarray(shade_pallas.shadow_sort_key(
        data, static, s, tables, 0,
        info.point, info.normal, info.offset_by,
        state.origin, state.direction, live, receives,
        state.sample_idx, state.pixel, state.time, vd))
    segs = s.nee_light_samples * (1 + s.volume_marches)
    assert np.isfinite(key).all()
    assert (key >= segs).all()  # every segment costs >= 1
    assert key.max() > key.min()  # it actually discriminates
    # rays that shade nothing should price at the floor
    dead = ~np.asarray(receives) & ~np.asarray(live)
    if dead.any():
        assert np.allclose(key[dead], segs)


def test_sorted_intersect_bit_identical(interpret_fused):
    """sorted_intersect chunk-sorts the wavefront by the pre-intersect
    primary-march cost key at depths >= 1 (composing with the shadow
    sort's permutation for one unsort at bounce end) — block membership
    is the only thing that changes, so the whole PathState must be
    BIT-identical with it on/off, at every depth, with the shadow sort
    both on and off (round-5: tools/perf_block_model.py)."""
    n = 512
    res = (32, 32)
    for shadow_sort in (True, False):
        base = RenderSettings(resolution=res, spp=4, max_marches=64,
                              max_vis_marches=48, rays_per_pass=n,
                              sorted_shadow_march=shadow_sort,
                              sorted_intersect=False)
        data, static, camera = presets.default_scene(resolution=res)
        plain = _run_bounces(base, data, static, camera, n,
                             depths=(0, 1, 2))
        srt = _run_bounces(
            dataclasses.replace(base, sorted_intersect=True),
            data, static, camera, n, depths=(0, 1, 2))
        for d, (a, b) in enumerate(zip(plain, srt)):
            for field in ("radiance", "throughput", "origin",
                          "direction", "alive", "pixel", "sample_idx",
                          "prev_pdf", "color_out", "bg_out",
                          "alpha_out", "normal_out", "time"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, field)),
                    np.asarray(getattr(b, field)),
                    err_msg=f"{field} differs at depth {d} "
                            f"shadow_sort={shadow_sort}")
