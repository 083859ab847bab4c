"""Checkpoint / resume for progressive and preemptible rendering.

The reference has no checkpointing; its `progressive_epoch` counter is
unused scaffolding (reference src/film.rs:178, :657, SURVEY.md §5). Here
the film accumulator (per-pixel channel sums + sample counts) *is* the
natural checkpoint state: saving it between passes makes a render
resumable after preemption, and — because the samplers are fully
counter-based in (pixel, sample_idx) — spp can GROW across runs:
re-rendering with a higher spp against the same checkpoint renders only
the missing sample indices [spp_done, spp_new) per pixel and accumulates
them onto the saved film (renderer.render_frame's segment loop).

Checkpoints are .npz files with a config fingerprint; resuming under a
different scene/settings fingerprint is refused. `spp` is deliberately
EXCLUDED from the fingerprint (it tracks progress, not identity) and
stored as explicit progress fields instead:

  spp_base  - samples fully accumulated for every pixel below this index
  spp       - target sample count of the in-flight segment
  next_pass - passes of the segment [spp_base, spp) already accumulated
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from rayn_tpu.config import RenderSettings
from rayn_tpu.render import film as film_mod


class Progress(NamedTuple):
    """Resume point of a checkpointed render (see module docstring)."""
    film: film_mod.Film
    spp_base: int
    spp: int
    next_pass: int


def _fingerprint(settings: RenderSettings, frame: int,
                 scene=None, camera=None, fis_table=None,
                 time_range=None) -> str:
    """Digest of everything that determines the accumulated image:
    render settings (except spp — progress, not identity), frame number,
    the full scene arrays (SceneData pytree leaves), the camera
    (including its animation channels), the built filter table (captures
    filter kind + radius + table size) and the shutter time range.
    Resuming under any mismatch is refused — silently blending two
    different renders would corrupt the image."""
    import jax

    cfg = dataclasses.asdict(settings)
    del cfg["spp"]  # progressive: more samples extend, never conflict
    h = hashlib.sha256()
    h.update(json.dumps(
        {"settings": cfg, "frame": frame,
         "time_range": [float(t) for t in time_range]
         if time_range is not None else None,
         "camera_kind": type(camera).__name__ if camera is not None
         else None},
        sort_keys=True, default=str).encode())
    for leaf in jax.tree.leaves((scene, camera, fis_table)):
        arr = np.asarray(leaf)
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(arr.tobytes())
    return h.hexdigest()[:16]


def save(path: str, film: film_mod.Film, settings: RenderSettings,
         frame: int, next_pass: int, scene=None, camera=None,
         fis_table=None, time_range=None, spp_base: int = 0,
         spp: Optional[int] = None) -> None:
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(
        tmp,
        color=np.asarray(film.color), alpha=np.asarray(film.alpha),
        background=np.asarray(film.background),
        normal=np.asarray(film.normal), samples=np.asarray(film.samples),
        # extra AOV accumulators by position; settings.extra_aovs is in
        # the fingerprint, so a load always sees matching arrays
        **{f"extra{i}": np.asarray(a) for i, a in enumerate(film.extra)},
        next_pass=np.int64(next_pass),
        spp_base=np.int64(spp_base),
        spp=np.int64(settings.spp if spp is None else spp),
        fingerprint=np.bytes_(
            _fingerprint(settings, frame, scene, camera, fis_table,
                         time_range).encode()),
    )
    os.replace(tmp, path)


def load_progress(path: str, settings: RenderSettings, frame: int,
                  scene=None, camera=None, fis_table=None,
                  time_range=None) -> Optional[Progress]:
    """Full resume point (film + segment progress), or None if the file
    is absent or was written under a different scene/settings/camera
    fingerprint. spp mismatches do NOT refuse — the caller decides how
    to extend (renderer.render_frame grows spp progressively)."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        fp = bytes(z["fingerprint"]).decode()
        if fp != _fingerprint(settings, frame, scene, camera, fis_table,
                              time_range):
            return None
        extra = []
        while f"extra{len(extra)}" in z:
            extra.append(jnp.asarray(z[f"extra{len(extra)}"]))
        film = film_mod.Film(
            color=jnp.asarray(z["color"]), alpha=jnp.asarray(z["alpha"]),
            background=jnp.asarray(z["background"]),
            normal=jnp.asarray(z["normal"]),
            samples=jnp.asarray(z["samples"]),
            extra=tuple(extra))
        return Progress(film, int(z["spp_base"]), int(z["spp"]),
                        int(z["next_pass"]))


def load(path: str, settings: RenderSettings, frame: int, scene=None,
         camera=None, fis_table=None,
         time_range=None) -> Optional[tuple[film_mod.Film, int]]:
    """Returns (film, next_pass) or None if absent/incompatible —
    incompatible INCLUDING an spp mismatch (same-shape resume only; use
    load_progress for progressive-spp awareness)."""
    p = load_progress(path, settings, frame, scene, camera, fis_table,
                      time_range)
    if p is None or p.spp != settings.spp or p.spp_base != 0:
        return None
    return p.film, p.next_pass
