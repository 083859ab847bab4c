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

    def test_splat_aligned_matches_splat(self):
        """Pass-aligned splat == generic scatter-add splat (up to f32
        summation order) when the pass covers whole pixels in pixel-major
        order, including a tail pass that extends past the film end with
        zeroed out-of-range lanes."""
        rng = np.random.default_rng(3)
        n_px, spp = 10, 4
        for pixel0, n in ((2, 24), (8, 16)):  # interior + overhanging tail
            rows = n // spp
            pixel = pixel0 + np.arange(n) // spp
            in_range = pixel < n_px
            color = rng.uniform(size=(n, 3)).astype(np.float32)
            color[~in_range] = 0.0
            alpha = rng.uniform(size=n).astype(np.float32)
            alpha[~in_range] = 0.0
            bg = rng.uniform(size=(n, 3)).astype(np.float32)
            bg[~in_range] = 0.0
            nrm = rng.uniform(size=(n, 3)).astype(np.float32)
            nrm[~in_range] = 0.0
            count = in_range.astype(np.float32)

            base = film_mod.Film(
                color=jnp.asarray(rng.uniform(size=(n_px, 3)), jnp.float32),
                alpha=jnp.asarray(rng.uniform(size=n_px), jnp.float32),
                background=jnp.asarray(rng.uniform(size=(n_px, 3)),
                                       jnp.float32),
                normal=jnp.asarray(rng.uniform(size=(n_px, 3)), jnp.float32),
                samples=jnp.asarray(rng.uniform(size=n_px), jnp.float32))
            a = film_mod.splat(base, jnp.asarray(np.minimum(pixel, n_px - 1),
                                                 jnp.int32),
                               jnp.asarray(color), jnp.asarray(alpha),
                               jnp.asarray(bg), jnp.asarray(nrm),
                               jnp.asarray(count))
            b = film_mod.splat_aligned(base, jnp.int32(pixel0),
                                       jnp.asarray(color), jnp.asarray(alpha),
                                       jnp.asarray(bg), jnp.asarray(nrm),
                                       jnp.asarray(count), spp)
            for fa, fb in zip(a, b):
                np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                           atol=2e-6,
                                           err_msg=f"pixel0={pixel0}")

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
