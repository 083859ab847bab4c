"""Extensible film AOVs.

The reference's channel system is macro-generated and type-parametric
(reference src/film.rs:25-120, `Film<N>` over a type-level channel
count) — adding an AOV means adding a `ChannelKind` variant and the
macro does the rest. The TPU analog is this registry: an AOV is a name,
a per-lane width, and a jittable extractor over the depth-0 shading
data; `RenderSettings.extra_aovs` (a static tuple of names) selects
which get accumulated. The four reference channels
(Color/Alpha/Background/WorldNormal) stay fixed Film fields — they are
the hot path — and extras ride the same splat/resolve/save pipeline
(render/film.py Film.extra).

All extras follow the reference's depth-0 AOV convention (Alpha and
WorldNormal are written once at camera-hit time for receiving lanes,
src/integrator.rs:161-169).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AovSpec:
    """One optional channel: `fn(hit, info, mat) -> [N] or [N, dim]`
    evaluated at depth 0; the caller masks to receiving lanes and
    accumulates into Film.extra."""
    name: str
    dim: int  # 1 or 3
    fn: Callable


AOV_SPECS = {
    "depth": AovSpec("depth", 1, lambda hit, info, mat: hit.t),
    "position": AovSpec("position", 3, lambda hit, info, mat: info.point),
    "albedo": AovSpec("albedo", 3, lambda hit, info, mat: mat.color_a),
    "mat_id": AovSpec("mat_id", 1,
                      lambda hit, info, mat: info.mat.astype(jnp.float32)),
}


def specs_for(settings) -> tuple[AovSpec, ...]:
    """Resolve settings.extra_aovs names; unknown names fail loudly at
    trace time (a typo must not silently drop a channel)."""
    try:
        return tuple(AOV_SPECS[n] for n in settings.extra_aovs)
    except KeyError as e:
        raise ValueError(
            f"unknown AOV {e.args[0]!r}; available: "
            f"{sorted(AOV_SPECS)}") from None


def extract(settings, hit, info, mat, receives) -> tuple[jnp.ndarray, ...]:
    """Depth-0 AOV values for every configured extra channel, masked to
    receiving lanes (reference src/integrator.rs:161-169 convention)."""
    out = []
    for spec in specs_for(settings):
        v = spec.fn(hit, info, mat)
        if spec.dim == 1:
            out.append(jnp.where(receives, v, 0.0))
        else:
            out.append(jnp.where(receives[:, None], v, 0.0))
    return tuple(out)
