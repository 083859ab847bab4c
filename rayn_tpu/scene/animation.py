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
        Clamps outside [t0, t1].

        One-hot lerp-weight contraction, not `vals[i0]` — a native
        per-lane gather of the knot table is the measured TPU
        pathology (see sample_batched); with T <= 64 knots the [.., T]
        contraction runs at bandwidth speed. Adding exact zeros keeps
        the result bit-identical to the two-term lerp."""
        vals = self.values
        n = vals.shape[0]
        if n == 1:
            return jnp.broadcast_to(vals[0], t.shape + (vals.shape[1],))
        u = (t - self.t0) / (self.t1 - self.t0) * (n - 1)
        u = jnp.clip(u, 0.0, n - 1)
        i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n - 2)
        frac = u - i0.astype(jnp.float32)
        out = jnp.zeros(t.shape + (vals.shape[1],), jnp.float32)
        for j in range(n):
            wj = (jnp.where(i0 == j, 1.0 - frac, 0.0)
                  + jnp.where(i0 + 1 == j, frac, 0.0))[..., None]
            out = out + wj * vals[j]
        return out


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
    -> [N, K, D].

    The animated case contracts one-hot lerp weights [N, T] against the
    knot table instead of gathering `vals[:, i0, :]` — the native
    per-lane knot gather here measured 2.6x on WHOLE animated-geo
    passes once this function reached the per-pass hot path
    (`scene.sphere_centers_at` feeds the fused kernels' per-lane
    sphere-center inputs and the round-5 pre-intersect cost key;
    BASELINE.md round-5 "animated-geo regression"). Same rule as
    sample_batched_at below: one-hot contractions for small tables,
    never native gathers."""
    vals = ch.values
    k, n, d = vals.shape
    if n == 1:
        return jnp.broadcast_to(vals[:, 0, :], t.shape + (k, d))
    u = (t - ch.t0) / (ch.t1 - ch.t0) * (n - 1)
    u = jnp.clip(u, 0.0, n - 1)
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n - 2)
    frac = u - i0.astype(jnp.float32)
    # Unrolled elementwise contraction, not einsum: a dot_general here
    # made XLA stage vmem-resident operands around the downstream mega
    # kernel, pushing its scoped-vmem over the 16M Mosaic limit
    # (measured: 17.28M OOM at TL=TS=8). T elementwise terms fuse into
    # the surrounding glue with no big intermediate; adding exact zeros
    # keeps the value bit-identical to the two-term lerp.
    out = jnp.zeros(t.shape + (k, d), jnp.float32)
    for j in range(n):
        wj = (jnp.where(i0 == j, 1.0 - frac, 0.0)
              + jnp.where(i0 + 1 == j, frac, 0.0))[:, None, None]
        out = out + wj * vals[None, :, j, :]
    return out
