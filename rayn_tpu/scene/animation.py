"""Time-sampled animation channels.

The reference makes every animatable quantity a `Sequenced<T>` /
`WSequenced<T>` trait parameter — constants, closures `Fn(f32) -> T`, or
(feature-gated) keyframed interpolation (reference src/animation.rs:4-68).

On TPU the jit-friendly equivalent is a baked keyframe channel: a uniform
time grid of values, linearly interpolated at each ray's time. Constants
are 1-knot channels (zero interpolation cost after XLA folds the gather),
and procedural Python closures are baked host-side onto the grid at build
time (`AnimChannel.from_fn`) — this also *fixes* the reference's wide-
closure bug where all 4 SIMD lanes sampled lane 0's time
(src/animation.rs:62-68).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax.numpy as jnp


class AnimChannel(NamedTuple):
    """Uniformly-sampled keyframe channel over [t0, t1].

    values: [T, D] (D = value dims; 1 for scalars, 3 for vectors)
    t0, t1: scalar f32 arrays — the time range the knots span. For T == 1
    the channel is constant.
    """
    values: jnp.ndarray
    t0: jnp.ndarray
    t1: jnp.ndarray

    @staticmethod
    def constant(value) -> "AnimChannel":
        v = jnp.atleast_1d(jnp.asarray(value, jnp.float32))[None, :]
        return AnimChannel(v, jnp.float32(0.0), jnp.float32(1.0))

    @staticmethod
    def keyframes(times, values) -> "AnimChannel":
        """Bake arbitrary (time, value) keyframes onto the channel's uniform
        grid (values given at uniformly spaced `times[0]..times[-1]` are
        stored as-is; non-uniform input is resampled host-side)."""
        times = np.asarray(times, np.float64)
        values = np.atleast_2d(np.asarray(values, np.float32))
        if values.shape[0] != times.shape[0]:
            raise ValueError("times and values length mismatch")
        t0, t1 = float(times[0]), float(times[-1])
        n = len(times)
        uniform = np.linspace(t0, t1, n)
        if not np.allclose(times, uniform):
            res = np.empty_like(values)
            for d in range(values.shape[1]):
                res[:, d] = np.interp(uniform, times, values[:, d])
            values = res
        return AnimChannel(jnp.asarray(values), jnp.float32(t0), jnp.float32(t1))

    @staticmethod
    def from_fn(fn: Callable[[float], object], t0: float, t1: float,
                knots: int = 64) -> "AnimChannel":
        """Bake a host-side procedural closure (the analog of the
        reference's `Fn(f32) -> T` impls, src/animation.rs:55-68)."""
        ts = np.linspace(t0, t1, knots)
        vals = np.stack([np.atleast_1d(np.asarray(fn(float(t)), np.float32))
                         for t in ts])
        return AnimChannel(jnp.asarray(vals), jnp.float32(t0), jnp.float32(t1))

    def sample(self, t: jnp.ndarray) -> jnp.ndarray:
        """Linearly interpolate at times t [...]; returns [..., D].
        Clamps outside [t0, t1]."""
        vals = self.values
        n = vals.shape[0]
        if n == 1:
            return jnp.broadcast_to(vals[0], t.shape + (vals.shape[1],))
        u = (t - self.t0) / (self.t1 - self.t0) * (n - 1)
        u = jnp.clip(u, 0.0, n - 1)
        i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n - 2)
        frac = (u - i0.astype(jnp.float32))[..., None]
        return vals[i0] * (1.0 - frac) + vals[i0 + 1] * frac


def stack_channels(channels: list[AnimChannel]) -> AnimChannel:
    """Stack K channels with identical knot counts into one batched channel
    with values [K, T, D] for vectorized per-object sampling."""
    knots = max(c.values.shape[0] for c in channels)
    vals = []
    for c in channels:
        v = c.values
        if v.shape[0] == 1 and knots > 1:
            v = jnp.broadcast_to(v, (knots,) + v.shape[1:])
        elif v.shape[0] != knots:
            raise ValueError("all animated channels in a store must share "
                             f"the same knot count ({v.shape[0]} vs {knots})")
        vals.append(v)
    t0 = channels[0].t0
    t1 = channels[0].t1
    return AnimChannel(jnp.stack(vals), t0, t1)


def sample_batched_at(ch: AnimChannel, obj_idx: jnp.ndarray,
                      t: jnp.ndarray) -> jnp.ndarray:
    """Sample a batched channel (values [K, T, D]) for per-ray object ids
    obj_idx [N] at per-ray times t [N] -> [N, D].

    Gathers directly from the small [K, T, D] knot table; never build a
    [N, K, D] intermediate and take_along_axis it — XLA lowers that to a
    ~66 KB/ray gather (measured), which dominated whole render passes.
    """
    from rayn_tpu.utils.gather import small_gather
    vals = ch.values
    k, n, d2 = vals.shape
    if n == 1:
        return small_gather(vals[:, 0, :], obj_idx)
    u = (t - ch.t0) / (ch.t1 - ch.t0) * (n - 1)
    u = jnp.clip(u, 0.0, n - 1)
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n - 2)
    frac = (u - i0.astype(jnp.float32))[:, None]
    # Animated case: one-hot contraction over the flattened
    # (object, knot) table — a native flat-index gather here measured
    # ~400 ms/pass when this landed on the fused hot path
    # (BASELINE.md round-4, external light resolution); the one-hot
    # form runs at bandwidth speed like every other scene lookup.
    flat = vals.reshape(k * n, d2)
    v0 = small_gather(flat, obj_idx * n + i0)
    v1 = small_gather(flat, obj_idx * n + i0 + 1)
    return v0 * (1.0 - frac) + v1 * frac


def sample_batched(ch: AnimChannel, t: jnp.ndarray) -> jnp.ndarray:
    """Sample a batched channel (values [K, T, D]) at per-ray times t [N]
    -> [N, K, D]."""
    vals = ch.values
    k, n, d = vals.shape
    if n == 1:
        return jnp.broadcast_to(vals[:, 0, :], t.shape + (k, d))
    u = (t - ch.t0) / (ch.t1 - ch.t0) * (n - 1)
    u = jnp.clip(u, 0.0, n - 1)
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n - 2)
    frac = (u - i0.astype(jnp.float32))[:, None, None]
    v0 = jnp.moveaxis(vals[:, i0, :], 1, 0)  # [N, K, D]
    v1 = jnp.moveaxis(vals[:, i0 + 1, :], 1, 0)
    return v0 * (1.0 - frac) + v1 * frac
