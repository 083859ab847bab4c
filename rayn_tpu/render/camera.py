"""Cameras.

Re-design of reference src/camera.rs. A camera turns per-ray
(ndc uv, time, lens samples) into world rays, vectorized over the
wavefront; all animatable inputs (origin / look-at / up / aperture /
focus) are AnimChannels sampled at each ray's time, giving camera motion
blur identical in spirit to the reference's `WSequenced` parameters
(src/camera.rs:75-118) but without its lane-0-only closure bug
(src/animation.rs:62-68).

`half_pixel_size_at(t) = hps_abs + hps_lin * t` feeds the SDF cone-traced
hit threshold (reference src/camera.rs:116-118, :282-284).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from rayn_tpu.scene.animation import AnimChannel
from rayn_tpu.utils import vecmath
from rayn_tpu.utils.sampling import concentric_disk


def _chan(v) -> AnimChannel:
    return v if isinstance(v, AnimChannel) else AnimChannel.constant(v)


def _look_basis(origin, at, up):
    """Right-handed camera basis with w pointing *backwards* (reference
    src/camera.rs:94-96)."""
    w = vecmath.normalize(origin - at)
    u = vecmath.normalize(vecmath.cross(up, w))
    v = vecmath.cross(w, u)
    return u, v, w


class PinholeCamera(NamedTuple):
    """Perspective pinhole camera (reference src/camera.rs:41-119)."""
    origin: AnimChannel
    at: AnimChannel
    up: AnimChannel
    half_w: jnp.ndarray
    half_h: jnp.ndarray
    hps: jnp.ndarray  # half-pixel size coefficient (slope in t)

    @staticmethod
    def make(resolution, vfov_degrees: float, origin, at, up):
        theta = vfov_degrees * math.pi / 180.0
        half_h = math.tan(theta / 2.0)
        aspect = resolution[0] / resolution[1]
        return PinholeCamera(
            _chan(origin), _chan(at), _chan(up),
            jnp.float32(aspect * half_h), jnp.float32(half_h),
            jnp.float32(half_h / resolution[1]))

    def generate(self, ndc: jnp.ndarray, time: jnp.ndarray,
                 lens_uv: jnp.ndarray):
        origin = self.origin.sample(time)
        at = self.at.sample(time)
        up = self.up.sample(time)
        u, v, w = _look_basis(origin, at, up)
        lower_left = origin - u * self.half_w - v * self.half_h - w
        d = (lower_left
             + u * (2.0 * self.half_w) * ndc[:, 0:1]
             + v * (2.0 * self.half_h) * ndc[:, 1:2]
             - origin)
        return origin, vecmath.normalize(d)

    def half_pixel_size_coeffs(self):
        """(abs, linear-in-t) terms of half_pixel_size_at."""
        return jnp.float32(0.0), self.hps


class ThinLensCamera(NamedTuple):
    """Depth-of-field camera (reference src/camera.rs:120-213)."""
    origin: AnimChannel
    at: AnimChannel
    up: AnimChannel
    aperture: AnimChannel
    focus: AnimChannel
    half_w: jnp.ndarray
    half_h: jnp.ndarray
    hps: jnp.ndarray

    @staticmethod
    def make(resolution, vfov_degrees: float, aperture, origin, at, up, focus):
        theta = vfov_degrees * math.pi / 180.0
        half_h = math.tan(theta / 2.0)
        aspect = resolution[0] / resolution[1]
        return ThinLensCamera(
            _chan(origin), _chan(at), _chan(up), _chan(aperture), _chan(focus),
            jnp.float32(aspect * half_h), jnp.float32(half_h),
            jnp.float32(half_h / resolution[1]))

    def generate(self, ndc: jnp.ndarray, time: jnp.ndarray,
                 lens_uv: jnp.ndarray):
        origin = self.origin.sample(time)
        at = self.at.sample(time)
        up = self.up.sample(time)
        focus = self.focus.sample(time)
        aperture = self.aperture.sample(time)  # [N, 1]
        focus_dist = vecmath.length(focus - origin, keepdims=True)
        u, v, w = _look_basis(origin, at, up)
        lower_left = (origin - (u * self.half_w + v * self.half_h + w)
                      * focus_dist)
        target = (lower_left
                  + u * (2.0 * self.half_w) * focus_dist * ndc[:, 0:1]
                  + v * (2.0 * self.half_h) * focus_dist * ndc[:, 1:2])
        rd = concentric_disk(lens_uv[:, 0], lens_uv[:, 1]) * aperture
        offset = u * rd[:, 0:1] + v * rd[:, 1:2]
        o = origin + offset
        return o, vecmath.normalize(target - o)

    def half_pixel_size_coeffs(self):
        return jnp.float32(0.0), self.hps


class OrthographicCamera(NamedTuple):
    """Parallel-projection camera (reference src/camera.rs:215-285)."""
    origin: AnimChannel
    at: AnimChannel
    up: AnimChannel
    half_w: jnp.ndarray
    half_h: jnp.ndarray
    hps: jnp.ndarray  # constant half pixel size

    @staticmethod
    def make(resolution, vertical_size: float, origin, at, up):
        aspect = resolution[0] / resolution[1]
        size_h = vertical_size
        size_w = vertical_size * aspect
        return OrthographicCamera(
            _chan(origin), _chan(at), _chan(up),
            jnp.float32(size_w / 2.0), jnp.float32(size_h / 2.0),
            jnp.float32(vertical_size / resolution[1] / 2.0))

    def generate(self, ndc: jnp.ndarray, time: jnp.ndarray,
                 lens_uv: jnp.ndarray):
        origin = self.origin.sample(time)
        at = self.at.sample(time)
        up = self.up.sample(time)
        # Note the reference flips the basis convention here: w points
        # forward (src/camera.rs:262-264).
        w = vecmath.normalize(at - origin)
        u = vecmath.normalize(vecmath.cross(w, up))
        v = vecmath.cross(u, w)
        lower_left = origin - u * self.half_w - v * self.half_h
        o = (lower_left
             + u * (2.0 * self.half_w) * ndc[:, 0:1]
             + v * (2.0 * self.half_h) * ndc[:, 1:2])
        d = jnp.broadcast_to(w, o.shape) if w.shape != o.shape else w
        return o, d

    def half_pixel_size_coeffs(self):
        return self.hps, jnp.float32(0.0)


Camera = PinholeCamera | ThinLensCamera | OrthographicCamera
