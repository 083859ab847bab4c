"""Shadow-march cost-reduction levers (round-3 study; BASELINE.md):
bounding-volume segment clipping, truncated-iteration shadow DE, and the
scaled shadow epsilon — exactness and plumbing tests.

The BV clip must not change any occlusion verdict (the bound provably
contains the hit shell); the DE/eps reductions are fidelity-traded and
only need to (a) reach both march paths identically and (b) stay gated
by the oracle/statistical fidelity tests at their chosen defaults.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import march as march_ops
from rayn_tpu.ops import march_pallas
from rayn_tpu.ops import sdf as sdf_ops
from rayn_tpu.ops import intersect
from rayn_tpu.scene import presets


BOUND = 3.6  # measured for the default MandelBox (scene/presets.py)


def _mandelbox(iters=12):
    return sdf_ops.mandelbox(iterations=iters, box_fold_l=1.0,
                             sphere_min_rad=0.01, sphere_fixed_rad=1.9,
                             scale=-2.1)


def _segments(n=4096, seed=3):
    """Realistic shadow segments: starts near/inside the fractal region
    and far outside, ends at light-like positions."""
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    start = jax.random.uniform(k[0], (n, 3), minval=-5.0, maxval=5.0)
    end = jax.random.uniform(k[1], (n, 3), minval=-2.5, maxval=2.5)
    active = jax.random.uniform(k[2], (n,)) > 0.1
    return start, end, active


def test_bv_clip_preserves_verdicts_jnp():
    prog = _mandelbox()
    start, end, active = _segments()
    plain = np.asarray(march_ops.march_occlusion(
        prog, start, end, 0.5, 100, active=active))
    clipped = np.asarray(march_ops.march_occlusion(
        prog, start, end, 0.5, 100, active=active, bound_radius=BOUND))
    # the clip may only *add* hits for creeping lanes that ran out of
    # steps before (extra budget near the surface); it must never lose
    # one, and on this step budget the verdicts agree outright
    np.testing.assert_array_equal(plain, clipped)


def test_bv_clip_pallas_matches_jnp():
    prog = _mandelbox()
    start, end, active = _segments(seed=4)
    ref = np.asarray(march_ops.march_occlusion(
        prog, start, end, 0.5, 64, active=active, bound_radius=BOUND))
    pal = np.asarray(march_pallas.march_occlusion(
        prog, start, end, 0.5, 64, active=active, bound_radius=BOUND,
        interpret=True))
    np.testing.assert_array_equal(ref, pal)


def test_bv_clip_skips_outside_segments():
    """Segments entirely outside the bounding sphere must report
    unoccluded without depending on the step budget."""
    prog = _mandelbox()
    n = 256
    k = jax.random.split(jax.random.PRNGKey(5), 2)
    offs = jnp.asarray([8.0, 0.0, 0.0])
    start = jax.random.uniform(k[0], (n, 3), minval=5.0, maxval=9.0) + offs
    end = start + jax.random.uniform(k[1], (n, 3), minval=-1.0, maxval=1.0)
    occ = np.asarray(march_ops.march_occlusion(
        prog, start, end, 0.5, 1, active=jnp.ones((n,), bool),
        bound_radius=BOUND))
    assert not occ.any()


def test_reduced_program_variant():
    prog = _mandelbox(12)
    red = prog.reduced(6)
    assert red.fn_c is not None and red.params is prog.params
    p = jnp.asarray([[1.1, 0.4, -0.2]])
    full = float(prog.dist(p)[0])
    reduced = float(red.dist(p)[0])
    direct6 = float(_mandelbox(6).dist(p)[0])
    assert reduced == direct6
    assert reduced != full
    # reduced(0) and non-reducible programs are identity
    assert prog.reduced(0) is prog
    nored = sdf_ops.sphere(1.0)
    assert nored.reduced(6) is nored


def test_shadow_settings_reach_test_occluded():
    """shadow_de_iterations + shadow_eps_scale must change
    intersect.test_occluded exactly like a manually reduced program with
    scaled detail."""
    data, static, _cam = presets.default_scene(resolution=(8, 8))
    start, end, active = _segments(n=1024, seed=6)
    time = jnp.zeros((1024,))
    base = RenderSettings(resolution=(8, 8), max_vis_marches=48,
                          use_pallas_occlusion=False, shadow_bv_clip=False)

    vis_red = intersect.test_occluded(
        data, static,
        dataclasses.replace(base, shadow_de_iterations=6,
                            shadow_eps_scale=2.0),
        start, end, time, active)

    # manual twin: reduced program + scaled detail through the raw march
    from rayn_tpu.ops import spheres as sphere_ops
    from rayn_tpu.scene.scene import sphere_centers_at
    prog = static.sdf_program(data).reduced(6)
    occ_sph = jnp.any(sphere_ops.occluded(
        start, end, sphere_centers_at(data, time), data.sphere_radii),
        axis=1)
    occ_sdf = march_ops.march_occlusion(
        prog, start, end, base.sdf_detail_scale * 2.0, 48,
        active=active & ~occ_sph)
    want = jnp.where(occ_sph | occ_sdf, 0.0, 1.0)
    np.testing.assert_array_equal(np.asarray(vis_red), np.asarray(want))

    # and the reduction must actually change something vs defaults
    vis_full = intersect.test_occluded(
        data, static, base, start, end, time, active)
    assert (np.asarray(vis_red) != np.asarray(vis_full)).any()


@pytest.mark.parametrize("shadow_iters", [0, 8])
def test_fused_matches_unfused_with_reduction(monkeypatch, shadow_iters):
    """The fused shadow kernel must track the unfused path when the
    reduction knobs are set (same reduced DE, same eps, same clip)."""
    from rayn_tpu.ops import shade_pallas
    from test_fused_shadows import _run_bounces

    monkeypatch.setattr(shade_pallas, "INTERPRET", True)
    n = 512
    res = (16, 16)
    base = RenderSettings(resolution=res, spp=2, max_marches=48,
                          max_vis_marches=32, rays_per_pass=n,
                          use_fused_shadows=False,
                          shadow_de_iterations=shadow_iters,
                          shadow_eps_scale=2.0, shadow_bv_clip=True)
    data, static, camera = presets.default_scene(resolution=res)
    plain = _run_bounces(base, data, static, camera, n, depths=(0,))
    fused = _run_bounces(
        dataclasses.replace(base, use_fused_shadows=True),
        data, static, camera, n, depths=(0,))
    for a, b in zip(plain, fused):
        ra, rb = np.asarray(a.radiance), np.asarray(b.radiance)
        close = np.isclose(ra, rb, rtol=2e-4, atol=2e-5)
        assert (1.0 - close.mean()) < 1.5e-2
