"""Tests for the sampler backbone (SURVEY.md §4: determinism tests)."""

import jax.numpy as jnp
import numpy as np

from rayn_tpu.config import RenderSettings
from rayn_tpu.utils import rng


def small_settings(sampler="rd"):
    return RenderSettings(resolution=(8, 8), spp=16, max_bounces=1,
                          volume_marches=1, sampler=sampler)


class TestRd:
    def test_rd_low_discrepancy_1d(self):
        # R_1 with golden-ratio step: star discrepancy of first n points is
        # O(log n / n); just sanity-check near-uniform bin counts.
        seq = rng.rd_sequence(1, 1024, 0)[:, 0]
        hist, _ = np.histogram(seq, bins=16, range=(0, 1))
        assert hist.min() >= 60 and hist.max() <= 68

    def test_rd_offset_is_sequence_shift(self):
        a = rng.rd_sequence(2, 32, 100)
        b = rng.rd_sequence(2, 16, 116)
        np.testing.assert_array_equal(a[16:], b)

    def test_rd_alphas_known_values(self):
        # alpha_1 = 1/phi (golden ratio conjugate)
        a = rng.rd_alphas_u64(1)[0] / float(1 << 64)
        np.testing.assert_allclose(a, 0.6180339887498949, rtol=1e-12)
        # plastic-constant pair
        a2 = [x / float(1 << 64) for x in rng.rd_alphas_u64(2)]
        np.testing.assert_allclose(a2, [0.7548776662466927, 0.5698402909980532],
                                   rtol=1e-12)

    def test_deterministic(self):
        s = small_settings()
        idx = jnp.arange(16, dtype=jnp.int32) % s.spp
        px = jnp.arange(16, dtype=jnp.int32)
        t1 = rng.build_sample_tables(s, frame=1)
        t2 = rng.build_sample_tables(s, frame=1)
        a = np.asarray(rng.sample_1d(s, t1, 2, idx, px))
        b = np.asarray(rng.sample_1d(s, t2, 2, idx, px))
        np.testing.assert_array_equal(a, b)
        t3 = rng.build_sample_tables(s, frame=2)
        c = np.asarray(rng.sample_1d(s, t3, 2, idx, px))
        assert not np.array_equal(a, c)

    def test_on_device_rd_matches_host_tables(self):
        # the arithmetic R_d evaluation must be bit-identical to the host
        # u64 fixed-point tables
        s = small_settings()
        frame = 3
        for set_id in (0, 7):
            want = rng.rd_sequence(1, 64, (frame + set_id) << 32)[:, 0]
            got = np.asarray(rng.rd_value_1d(
                jnp.uint32(frame), set_id, jnp.arange(64, dtype=jnp.uint32)))
            np.testing.assert_array_equal(want, got)
        for set_id in (0, 2):
            want = rng.rd_sequence(2, 64, (frame + s.num_1d_sets + set_id) << 32)
            u, v = rng.rd_value_2d(jnp.uint32(frame), s.num_1d_sets, set_id,
                                   jnp.arange(64, dtype=jnp.uint32))
            np.testing.assert_array_equal(want[:, 0], np.asarray(u))
            np.testing.assert_array_equal(want[:, 1], np.asarray(v))


class TestHash:
    def test_uniformity(self):
        x = jnp.arange(1 << 16, dtype=jnp.uint32)
        u = np.asarray(rng.hash_to_unit_f32(rng.pcg_hash(x)))
        assert 0.0 <= u.min() and u.max() < 1.0
        hist, _ = np.histogram(u, bins=64, range=(0, 1))
        expected = (1 << 16) / 64
        assert np.abs(hist - expected).max() < expected * 0.15

    def test_hash_combine_decorrelates(self):
        x = jnp.arange(4096, dtype=jnp.uint32)
        a = np.asarray(rng.hash_to_unit_f32(rng.hash_combine(x, 1)))
        b = np.asarray(rng.hash_to_unit_f32(rng.hash_combine(x, 2)))
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.05


class TestSamplerLookups:
    def test_shapes_and_range(self):
        for mode in ("rd", "hash"):
            s = small_settings(mode)
            t = rng.build_sample_tables(s, frame=1)
            idx = jnp.arange(16, dtype=jnp.int32) % s.spp
            px = jnp.arange(16, dtype=jnp.int32)
            u1 = np.asarray(rng.sample_1d(s, t, 0, idx, px))
            u2 = np.asarray(rng.sample_2d(s, t, 0, idx, px))
            assert u1.shape == (16,) and u2.shape == (16, 2)
            assert (u1 >= 0).all() and (u1 < 1).all()
            assert (u2 >= 0).all() and (u2 < 1).all()

    def test_cranley_patterson_differs_per_pixel(self):
        s = small_settings("rd")
        t = rng.build_sample_tables(s, frame=1)
        idx = jnp.zeros((8,), jnp.int32)
        px = jnp.arange(8, dtype=jnp.int32)
        u = np.asarray(rng.sample_1d(s, t, 0, idx, px))
        assert len(np.unique(u)) == 8

    def test_set_layout_no_overlap(self):
        s = RenderSettings(spp=4, max_bounces=3, volume_marches=2,
                           nee_light_samples=4)
        seen = set()
        ids = [rng.set1d_time()]
        for d in range(s.max_bounces + 1):
            ids += [rng.set1d_light_pick(s, d, i) for i in range(4)]
            ids += [rng.set1d_vol_pick(s, d, m, i)
                    for m in range(2) for i in range(4)]
            ids += [rng.set1d_vol_dist(s, d, m) for m in range(2)]
            ids += [rng.set1d_fresnel(s, d), rng.set1d_roulette(s, d)]
        for i in ids:
            assert i not in seen, f"duplicate 1d set {i}"
            seen.add(i)
        assert max(seen) == s.num_1d_sets - 1 and len(seen) == s.num_1d_sets

        seen2 = set()
        ids2 = [rng.set2d_pixel_uv(), rng.set2d_lens()]
        for d in range(s.max_bounces + 1):
            ids2 += [rng.set2d_nee(s, d, i) for i in range(4)]
            ids2 += [rng.set2d_vol(s, d, m, i)
                     for m in range(2) for i in range(4)]
            ids2 += [rng.set2d_diffuse(s, d), rng.set2d_spec(s, d)]
        for i in ids2:
            assert i not in seen2, f"duplicate 2d set {i}"
            seen2.add(i)
        assert max(seen2) == s.num_2d_sets - 1 and len(seen2) == s.num_2d_sets
