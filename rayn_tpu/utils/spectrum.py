"""Color / radiometry helpers.

The reference wraps linear-RGB in `Srgb`/`WSrgb` newtypes with a small op
surface (reference src/spectrum.rs:5-120). On TPU a color is just a
[..., 3] float32 array; this module provides the same operations as free
functions (SURVEY.md L1).
"""

from __future__ import annotations

import jax.numpy as jnp


def saturate(rgb: jnp.ndarray) -> jnp.ndarray:
    """Clamp to [0, 1] (reference src/spectrum.rs:30-38)."""
    return jnp.clip(rgb, 0.0, 1.0)


def gamma_corrected(rgb: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    """Power 1/gamma encode (reference src/spectrum.rs:40-46)."""
    return jnp.power(jnp.maximum(rgb, 0.0), 1.0 / gamma)


def normalized(rgb: jnp.ndarray) -> jnp.ndarray:
    """Unit-length color (reference src/spectrum.rs:48-52; used by the
    default scene's light colors, src/setup.rs:100-101)."""
    return rgb / jnp.linalg.norm(rgb, axis=-1, keepdims=True)


def max_channel(rgb: jnp.ndarray) -> jnp.ndarray:
    """Largest channel — drives Russian roulette (reference
    src/spectrum.rs:54-60, src/integrator.rs:149)."""
    return jnp.max(rgb, axis=-1)


def merge(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lane select: mask ? a : b (the reference's WSrgb::merge,
    src/spectrum.rs:85-87). mask: [...] bool; a, b: [..., 3]."""
    return jnp.where(mask[..., None], a, b)


def is_nan(rgb: jnp.ndarray) -> jnp.ndarray:
    """Per-lane any-channel NaN (reference src/spectrum.rs:79-82)."""
    return jnp.any(jnp.isnan(rgb), axis=-1)
