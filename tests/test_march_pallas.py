"""Pallas march kernels vs the jnp reference implementation (interpret
mode on CPU; the real-TPU equivalence is exercised by bench/driver runs)."""

import jax.numpy as jnp
import numpy as np

from rayn_tpu.ops import march, march_pallas, sdf


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestMarchPallasInterpret:
    def test_matches_jnp_march_mandelbox(self):
        prog = sdf.mandelbox(6, 1.0, 0.01, 1.9, -2.1)
        n = 200  # deliberately not a multiple of the 1024-ray block
        o, d = _rays(n)
        t_max = jnp.full((n,), 50.0)
        eps_abs = jnp.zeros((n,))
        eps_lin = jnp.full((n,), 1e-3)
        active = jnp.asarray(np.random.default_rng(1).uniform(size=n) > 0.2)
        a = march.march(prog, o, d, t_max, 2.5e-5, eps_abs, eps_lin,
                        max_steps=64, active=active)
        b = march_pallas.march(prog, o, d, t_max, 2.5e-5, eps_abs, eps_lin,
                               max_steps=64, active=active, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_matches_jnp_occlusion(self):
        prog = sdf.sphere(1.0)
        rng = np.random.default_rng(2)
        n = 150
        start = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
        end = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
        active = jnp.ones((n,), bool)
        a = march.march_occlusion(prog, start, end, 0.5, 64, active=active)
        b = march_pallas.march_occlusion(prog, start, end, 0.5, 64,
                                         active=active, interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_matches_jnp_occlusion_relaxed(self):
        """Over-relaxed occlusion: Pallas kernel == jnp twin at
        relax=1.5 (the conservative overshoot fallback keeps results
        exact, so both must also equal the relax=1.0 answer)."""
        prog = sdf.mandelbox(6, 1.0, 0.01, 1.9, -2.1)
        rng = np.random.default_rng(5)
        n = 300
        start = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
        end = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
        active = jnp.asarray(rng.uniform(size=n) > 0.15)
        a = march.march_occlusion(prog, start, end, 0.5, 100,
                                  active=active, relax=1.5)
        b = march_pallas.march_occlusion(prog, start, end, 0.5, 100,
                                         active=active, relax=1.5,
                                         interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        plain = march.march_occlusion(prog, start, end, 0.5, 100,
                                      active=active)
        # identical visibility on a well-behaved budget
        assert (np.asarray(a) == np.asarray(plain)).mean() > 0.97

    def test_phased_occlusion_bit_identical(self):
        """Two-phase straggler-packed occlusion must be bit-identical to
        the single-phase kernel for every phase split (the per-lane step
        sequence is unchanged; only block membership differs)."""
        prog = sdf.mandelbox(6, 1.0, 0.01, 1.9, -2.1)
        rng = np.random.default_rng(9)
        n = 700
        start = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
        end = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
        active = jnp.asarray(rng.uniform(size=n) > 0.15)
        ref = march.march_occlusion(prog, start, end, 0.5, 100,
                                    active=active)
        for s1 in (1, 16, 99, 100, 150):
            out = march_pallas.march_occlusion_phased(
                prog, start, end, 0.5, 100, active=active,
                phase1_steps=s1, interpret=True)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref),
                                          err_msg=f"phase1_steps={s1}")

    def test_sorted_occlusion_bit_identical(self):
        """Predictor-sorted occlusion must be bit-identical to the
        single-phase kernel for every phase split: the sort only changes
        which lanes share a block (performance), never a lane's step
        sequence, and the un-permute restores original order exactly."""
        prog = sdf.mandelbox(6, 1.0, 0.01, 1.9, -2.1)
        rng = np.random.default_rng(11)
        n = 700
        start = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
        end = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
        active = jnp.asarray(rng.uniform(size=n) > 0.15)
        ref = march.march_occlusion(prog, start, end, 0.5, 100,
                                    active=active)
        for s1 in (1, 8, 99, 100, 150):
            out = march_pallas.march_occlusion_sorted(
                prog, start, end, 0.5, 100, active=active,
                phase1_steps=s1, interpret=True)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref),
                                          err_msg=f"phase1_steps={s1}")

    def test_sorted_march_bit_identical(self):
        """Sorted primary march == single-phase Pallas march bit-for-bit
        for every phase split (same per-lane step sequence, un-permute
        exact). The jnp twin only agrees to ~1e-5 (different fusion of
        the same arithmetic), matching test_matches_jnp_march_mandelbox."""
        prog = sdf.mandelbox(6, 1.0, 0.01, 1.9, -2.1)
        n = 500
        o, d = _rays(n, seed=13)
        t_max = jnp.full((n,), 50.0)
        eps_abs = jnp.zeros((n,))
        eps_lin = jnp.full((n,), 1e-3)
        active = jnp.asarray(np.random.default_rng(14).uniform(size=n) > 0.2)
        ref = march_pallas.march(prog, o, d, t_max, 2.5e-5, eps_abs,
                                 eps_lin, max_steps=64, active=active,
                                 interpret=True)
        ref_jnp = march.march(prog, o, d, t_max, 2.5e-5, eps_abs, eps_lin,
                              max_steps=64, active=active)
        for s1 in (1, 8, 63, 64, 99):
            out = march_pallas.march_sorted(
                prog, o, d, t_max, 2.5e-5, eps_abs, eps_lin,
                max_steps=64, active=active, phase1_steps=s1,
                interpret=True)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref),
                                          err_msg=f"phase1_steps={s1}")
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref_jnp),
                                       rtol=1e-5, atol=1e-5)

    def test_inactive_lanes_miss(self):
        prog = sdf.sphere(1.0)
        o = jnp.asarray([[0.0, 0.0, 3.0]] * 4)
        d = jnp.asarray([[0.0, 0.0, -1.0]] * 4)
        t_max = jnp.full((4,), 50.0)
        active = jnp.asarray([True, False, True, False])
        t = march_pallas.march(prog, o, d, t_max, 1e-4, jnp.zeros(4),
                               jnp.zeros(4), 64, active, interpret=True)
        t = np.asarray(t)
        assert abs(t[0] - 2.0) < 1e-2 and abs(t[2] - 2.0) < 1e-2
        assert t[1] > 50.0 and t[3] > 50.0

    def test_chained_occlusion_bit_identical(self):
        """K segments per ray chained through ONE while loop
        (march_occlusion_chained) must reproduce the per-segment
        march_occlusion verdicts exactly — the chain changes loop
        scheduling, never a segment's step sequence — with and without
        the bounding-volume clip, at odd K/N and with a step cap small
        enough that some segments resolve by exhaustion."""
        prog = sdf.mandelbox(6, 1.0, 0.01, 1.9, -2.1)
        rng = np.random.default_rng(9)
        for K, n, cap, bv in ((12, 1000, 100, 0.0), (12, 1000, 100, 3.6),
                              (5, 517, 23, 3.6), (1, 200, 64, 0.0)):
            start = jnp.asarray(
                rng.uniform(-3.5, 3.5, (K, n, 3)).astype(np.float32))
            end = start + jnp.asarray(
                rng.normal(size=(K, n, 3)).astype(np.float32) * 2.0)
            active = jnp.asarray(rng.uniform(size=(K, n)) < 0.5)
            ref = np.stack([
                np.asarray(march.march_occlusion(
                    prog, start[k], end[k], 0.5, cap, active=active[k],
                    bound_radius=bv))
                for k in range(K)])
            for group in (1, 4, 16):
                got = np.asarray(march_pallas.march_occlusion_chained(
                    prog, start, end, 0.5, cap, active, interpret=True,
                    bound_radius=bv, advance_group=group))
                np.testing.assert_array_equal(
                    ref, got,
                    err_msg=f"K={K} n={n} cap={cap} bv={bv} group={group}")
