"""Multi-channel film.

The reference accumulates per-tile sample sums under a mutex and divides
by the sample count at merge time (reference src/film.rs:132-203,
:660-692). The TPU film is a pytree of flat per-pixel accumulators; every
render pass scatter-adds its terminated rays' channel values
(`.at[pixel].add`, the segment-sum the reference's tile merge becomes on
TPU per SURVEY.md §2c), and normalization divides once by spp at the end.
The film pytree is also the natural checkpoint state for progressive /
preemptible rendering (SURVEY.md §5).

Channels mirror reference src/film.rs:103-120: Color, Alpha, Background,
WorldNormal.
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class Film(NamedTuple):
    color: jnp.ndarray       # [P, 3] sum of terminated path radiance
    alpha: jnp.ndarray       # [P]    sum of hit coverage
    background: jnp.ndarray  # [P, 3] sum of depth-0 escaped radiance
    normal: jnp.ndarray      # [P, 3] sum of depth-0 world normals
    samples: jnp.ndarray     # [P]    per-pixel sample counts
    # optional extra AOV accumulators (render/aovs.py registry), in
    # RenderSettings.extra_aovs order — [P] or [P, 3] each
    extra: tuple = ()


def new_film(n_pixels: int, settings=None) -> Film:
    extra = ()
    if settings is not None and settings.extra_aovs:
        from rayn_tpu.render.aovs import specs_for
        extra = tuple(
            jnp.zeros((n_pixels,) if s.dim == 1 else (n_pixels, 3),
                      jnp.float32) for s in specs_for(settings))
    return Film(
        color=jnp.zeros((n_pixels, 3), jnp.float32),
        alpha=jnp.zeros((n_pixels,), jnp.float32),
        background=jnp.zeros((n_pixels, 3), jnp.float32),
        normal=jnp.zeros((n_pixels, 3), jnp.float32),
        samples=jnp.zeros((n_pixels,), jnp.float32),
        extra=extra,
    )


def splat(film: Film, pixel: jnp.ndarray, color, alpha, background, normal,
          count, extra: tuple = ()) -> Film:
    """Scatter-add one pass's per-ray channel contributions.

    pixel: [N] int32 flat pixel ids; channel args are per-ray values
    already masked to zero where they don't apply.
    """
    return Film(
        color=film.color.at[pixel].add(color),
        alpha=film.alpha.at[pixel].add(alpha),
        background=film.background.at[pixel].add(background),
        normal=film.normal.at[pixel].add(normal),
        samples=film.samples.at[pixel].add(count),
        extra=tuple(acc.at[pixel].add(v)
                    for acc, v in zip(film.extra, extra)),
    )


def splat_aligned(film: Film, pixel0: jnp.ndarray, color, alpha,
                  background, normal, count, spp: int,
                  extra: tuple = ()) -> Film:
    """Pass-aligned splat: when a pass covers whole pixels in pixel-major
    order (ray i's pixel is pixel0 + i // spp), the scatter-add becomes a
    reshape-sum over the spp axis plus one dynamic-slice add per channel.
    Measured on v5e this replaces ~70 ms of scatter-adds per 1M-ray pass
    with ~1 ms of reduction; results differ from splat() only in f32
    summation order (the documented film tolerance). Out-of-range tail
    lanes must carry zero contributions (renderer guarantees this)."""
    import jax

    n = color.shape[0]
    rows = n // spp
    n_px = film.color.shape[0]

    def add(acc, vals, vec: bool):
        shape = (rows, spp, 3) if vec else (rows, spp)
        sums = vals.reshape(shape).sum(axis=1)
        pad = jnp.zeros((rows,) + acc.shape[1:], acc.dtype)
        padded = jnp.concatenate([acc, pad], axis=0)
        start = (pixel0, jnp.int32(0)) if vec else (pixel0,)
        cur = jax.lax.dynamic_slice(padded, start, sums.shape)
        padded = jax.lax.dynamic_update_slice(padded, cur + sums, start)
        return padded[:n_px]

    return Film(
        color=add(film.color, color, True),
        alpha=add(film.alpha, alpha, False),
        background=add(film.background, background, True),
        normal=add(film.normal, normal, True),
        samples=add(film.samples, count, False),
        extra=tuple(add(acc, v, v.ndim == 2)
                    for acc, v in zip(film.extra, extra)),
    )


class ResolvedFilm(NamedTuple):
    """Per-pixel means, shaped [H, W, ...] with y=0 at the bottom (the
    reference's raster convention; PNG save flips, src/film.rs:237)."""
    color: np.ndarray
    alpha: np.ndarray
    background: np.ndarray
    normal: np.ndarray
    # {name: [H, W(,3)]} means of the configured extra AOVs
    extra: dict = {}


def resolve(film: Film, resolution: tuple[int, int],
            settings=None) -> ResolvedFilm:
    w, h = resolution
    cnt = np.maximum(np.asarray(film.samples), 1e-8)[:, None]
    extra = {}
    if film.extra:
        from rayn_tpu.render.aovs import specs_for
        names = ([s.name for s in specs_for(settings)]
                 if settings is not None
                 else [f"aov{i}" for i in range(len(film.extra))])
        for name, acc in zip(names, film.extra):
            a = np.asarray(acc)
            if a.ndim == 2:
                extra[name] = (a / cnt).reshape(h, w, 3)
            else:
                extra[name] = (a / cnt[:, 0]).reshape(h, w)
    return ResolvedFilm(
        color=(np.asarray(film.color) / cnt).reshape(h, w, 3),
        alpha=(np.asarray(film.alpha) / cnt[:, 0]).reshape(h, w),
        background=(np.asarray(film.background) / cnt).reshape(h, w, 3),
        normal=(np.asarray(film.normal) / cnt).reshape(h, w, 3),
        extra=extra,
    )


def _gamma(rgb: np.ndarray, g: float = 2.2) -> np.ndarray:
    return np.power(np.maximum(rgb, 0.0), 1.0 / g)


def _to_u8(x: np.ndarray) -> np.ndarray:
    return np.clip(x * 255.0, 0.0, 255.0).astype(np.uint8)


def save_channels(resolved: ResolvedFilm, output_folder, base_name: str,
                  channels=("color", "alpha", "normal"),
                  transparent_background: bool = False) -> list[str]:
    """Write PNGs mirroring reference src/film.rs:205-377: color is
    saturate+gamma-2.2 of color(+background) (or alpha-composited when
    transparent_background), normal is 0.5+0.5 remap, alpha is grayscale.
    Images are y-flipped (raster y-up -> image y-down, src/film.rs:237)."""
    from PIL import Image

    out = Path(output_folder)
    out.mkdir(parents=True, exist_ok=True)
    written = []

    def flip(img):
        return img[::-1]

    for kind in channels:
        path = out / f"{base_name}_{kind}.png"
        if kind == "color":
            if transparent_background:
                rgb = _gamma(np.clip(resolved.color, 0.0, 1.0))
                a = resolved.alpha
                img = np.concatenate([_to_u8(rgb), _to_u8(a)[..., None]],
                                     axis=-1)
                Image.fromarray(flip(img), "RGBA").save(path)
            else:
                rgb = _gamma(np.clip(resolved.color + resolved.background,
                                     0.0, 1.0))
                Image.fromarray(flip(_to_u8(rgb)), "RGB").save(path)
        elif kind == "background":
            rgb = _gamma(np.clip(resolved.background, 0.0, 1.0))
            Image.fromarray(flip(_to_u8(rgb)), "RGB").save(path)
        elif kind == "normal":
            rgb = resolved.normal * 0.5 + 0.5
            Image.fromarray(flip(_to_u8(rgb)), "RGB").save(path)
        elif kind == "alpha":
            Image.fromarray(flip(_to_u8(resolved.alpha)), "L").save(path)
        elif kind in resolved.extra:
            a = resolved.extra[kind]
            if a.ndim == 3:  # vector AOV: clip to [0,1] RGB, no gamma
                Image.fromarray(flip(_to_u8(np.clip(a, 0.0, 1.0))),
                                "RGB").save(path)
            else:  # scalar AOV: normalize by its max -> grayscale
                mx = float(a.max()) or 1.0
                Image.fromarray(flip(_to_u8(a / mx)), "L").save(path)
        else:
            raise ValueError(f"unknown channel {kind}")
        written.append(str(path))
    return written
