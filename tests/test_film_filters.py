"""Film accumulation and reconstruction-filter tests."""

import jax.numpy as jnp
import numpy as np

from rayn_tpu.ops import filters
from rayn_tpu.render import film as film_mod


class TestFilters:
    def test_box_fis_is_uniform(self):
        f = filters.box_filter(0.5)
        table = filters.build_fis_table(f, 512)
        u = jnp.linspace(0.0, 1.0, 4097)[:-1]
        s = np.asarray(filters.fis_sample(table, u))
        assert abs(s.mean()) < 1e-3
        assert s.min() >= -0.5 - 1e-3 and s.max() <= 0.5 + 1e-3
        hist, _ = np.histogram(s, bins=8, range=(-0.5, 0.5))
        assert hist.min() > 0.8 * len(s) / 8

    def test_fis_distribution_matches_filter(self):
        # Histogram of FIS samples should be proportional to the filter
        # curve (filter importance sampling round-trip,
        # reference src/filter.rs:193-235).
        f = filters.blackman_harris(1.5)
        table = filters.build_fis_table(f, 512)
        u = jnp.linspace(0.0, 1.0, 1 << 16 + 1)[:-1]
        s = np.asarray(filters.fis_sample(table, u))
        hist, edges = np.histogram(s, bins=64, range=(-1.5, 1.5), density=True)
        centers = 0.5 * (edges[:-1] + edges[1:])
        want = np.asarray(f.evaluate(centers))
        want = want / want.sum() * hist.sum()
        err = np.abs(hist - want)[np.abs(centers) < 1.3]
        assert err.max() < 0.15 * want.max()

    def test_all_filters_build(self):
        # negative lobes (mitchell, lanczos) are clamped in the FIS pdf
        for name, ctor in filters.FILTERS.items():
            t = filters.build_fis_table(ctor())
            tn = np.asarray(t)
            assert np.isfinite(tn).all()
            assert (np.diff(tn) >= -1e-6).all(), f"{name} inv-cdf not monotone"

    def test_fis_symmetry(self):
        f = filters.blackman_harris(1.5)
        table = filters.build_fis_table(f, 512)
        a = float(filters.fis_sample(table, jnp.float32(0.25)))
        b = float(filters.fis_sample(table, jnp.float32(0.75)))
        np.testing.assert_allclose(a, -b, atol=1e-5)


class TestFilm:
    def test_splat_and_resolve(self):
        f = film_mod.new_film(4)
        pixel = jnp.asarray([0, 1, 1, 3], jnp.int32)
        color = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 1.0, 0], [0, 0, 2.0]])
        alpha = jnp.asarray([1.0, 1.0, 0.0, 1.0])
        zeros = jnp.zeros((4, 3))
        count = jnp.ones((4,))
        f = film_mod.splat(f, pixel, color, alpha, zeros, zeros, count)
        res = film_mod.resolve(f, (2, 2))
        np.testing.assert_allclose(res.color[0, 0], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(res.color[0, 1], [0, 1, 0], atol=1e-6)  # 2 samples
        np.testing.assert_allclose(res.alpha[0, 1], 0.5, atol=1e-6)
        np.testing.assert_allclose(res.color[1, 1], [0, 0, 2.0], atol=1e-6)

    def test_save_channels(self, tmp_path):
        f = film_mod.new_film(16)
        pixel = jnp.arange(16, dtype=jnp.int32)
        rgb = jnp.ones((16, 3)) * 0.5
        f = film_mod.splat(f, pixel, rgb, jnp.ones(16), rgb * 0.1, rgb,
                           jnp.ones(16))
        res = film_mod.resolve(f, (4, 4))
        paths = film_mod.save_channels(
            res, tmp_path, "t", ("color", "alpha", "normal", "background"))
        import os
        assert all(os.path.exists(p) for p in paths)
        # transparent background variant
        paths = film_mod.save_channels(res, tmp_path, "t2", ("color",),
                                       transparent_background=True)
        from PIL import Image
        img = Image.open(paths[0])
        assert img.mode == "RGBA"
