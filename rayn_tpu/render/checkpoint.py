"""Checkpoint / resume for progressive and preemptible rendering.

The reference has no checkpointing; its `progressive_epoch` counter is
unused scaffolding (reference src/film.rs:178, :657, SURVEY.md §5). Here
the film accumulator (per-pixel channel sums + sample counts) *is* the
natural checkpoint state: saving it between passes makes a render
resumable after preemption and lets spp grow progressively across runs.

Checkpoints are .npz files with a config fingerprint; resuming under a
different scene/settings fingerprint is refused.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from rayn_tpu.config import RenderSettings
from rayn_tpu.render import film as film_mod


def _fingerprint(settings: RenderSettings, frame: int,
                 scene=None, camera=None, fis_table=None,
                 time_range=None) -> str:
    """Digest of everything that determines the accumulated image:
    render settings, frame number, the full scene arrays (SceneData
    pytree leaves), the camera (including its animation channels), the
    built filter table (captures filter kind + radius + table size) and
    the shutter time range. Resuming under any mismatch is refused —
    silently blending two different renders would corrupt the image."""
    import jax

    h = hashlib.sha256()
    h.update(json.dumps(
        {"settings": dataclasses.asdict(settings), "frame": frame,
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
         fis_table=None, time_range=None) -> None:
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(
        tmp,
        color=np.asarray(film.color), alpha=np.asarray(film.alpha),
        background=np.asarray(film.background),
        normal=np.asarray(film.normal), samples=np.asarray(film.samples),
        next_pass=np.int64(next_pass),
        fingerprint=np.bytes_(
            _fingerprint(settings, frame, scene, camera, fis_table,
                         time_range).encode()),
    )
    os.replace(tmp, path)


def load(path: str, settings: RenderSettings, frame: int, scene=None,
         camera=None, fis_table=None,
         time_range=None) -> Optional[tuple[film_mod.Film, int]]:
    """Returns (film, next_pass) or None if absent/incompatible."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        fp = bytes(z["fingerprint"]).decode()
        if fp != _fingerprint(settings, frame, scene, camera, fis_table,
                              time_range):
            return None
        film = film_mod.Film(
            color=jnp.asarray(z["color"]), alpha=jnp.asarray(z["alpha"]),
            background=jnp.asarray(z["background"]),
            normal=jnp.asarray(z["normal"]),
            samples=jnp.asarray(z["samples"]))
        return film, int(z["next_pass"])
