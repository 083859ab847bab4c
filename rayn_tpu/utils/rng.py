"""Deterministic sample generation.

Two interchangeable samplers (RenderSettings.sampler):

- "rd": precomputed R_d (Roberts) low-discrepancy tables with per-pixel
  Cranley-Patterson rotation. This is the design of the reference
  (src/sampler.rs:18-37 builds per-set quasi-random tables with offset
  `(frame+set)<<32`; lookups add a per-pixel scramble and take fract,
  src/sampler.rs:62-94). The tables are built host-side in exact u64
  fixed point and gathered on device.

- "hash": fully counter-based PCG hash streams — every sample value is a
  pure function of (frame, pixel, sample_index, set), so any shard of the
  wavefront can be computed on any chip with no table at all. This is the
  scale-out sampler (BASELINE.json north star: "stratified per-pixel
  sampling moves to counter-based RNG").

The per-pixel scramble in the reference comes from a SmallRng seeded with
the pixel index (src/film.rs:460-461); here it is a PCG hash of
(pixel, set) which additionally decorrelates sets.

Sampler dimension ("set") layout, replacing the reference's implicit
layout in src/film.rs:564-589 / src/integrator.rs:76-139:

  1D sets: 0 = shutter-time jitter; then per depth d, base = 1 + d*S1:
    +0..L-1                 NEE light picks (L = nee_light_samples)
    +L..L+VM*L-1            volume-scatter light picks (march-major)
    +VM*L+L..VM*L+L+VM-1    volume-scatter distance samples
    +S1-2                   fresnel lobe select
    +S1-1                   russian-roulette
  2D sets: 0 = pixel uv (FIS), 1 = lens; then per depth d, base = 2 + d*S2:
    +0..L-1                 NEE light direction samples
    +L..L+VM*L-1            volume light direction samples
    +S2-2                   diffuse bounce
    +S2-1                   specular bounce

(The reference re-used a single 1D set's four SIMD lanes as four light
picks shared by the whole lane group, src/integrator.rs:76-82, and reused
samples_1d[1] for every volume march's distance sample,
src/integrator.rs:115; giving each decision its own set is a strict
stratification improvement at identical cost.)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from rayn_tpu.config import RenderSettings

_U64_MASK = (1 << 64) - 1


def _phi_d(dims: int) -> float:
    """Generalized golden ratio: unique positive root of x^(d+1) = x + 1."""
    x = 2.0
    for _ in range(64):
        x = (1.0 + x) ** (1.0 / (dims + 1))
    return x


def rd_alphas_u64(dims: int) -> list[int]:
    """Per-dimension R_d step in u64 fixed point."""
    g = _phi_d(dims)
    out = []
    for i in range(dims):
        frac = (1.0 / g) ** (i + 1) % 1.0
        out.append(int(round(frac * (1 << 64))) & _U64_MASK)
    return out


def rd_sequence(dims: int, n: int, index_offset: int) -> np.ndarray:
    """[n, dims] float32 R_d samples starting at sequence index `index_offset`.

    Exact u64 fixed-point accumulation (value = (idx * alpha) mod 2^64 /
    2^64), matching the quasi-rd crate used by the reference
    (src/sampler.rs:23-29)."""
    alphas = rd_alphas_u64(dims)
    idx = (np.arange(n, dtype=np.uint64) + np.uint64(index_offset & _U64_MASK))
    out = np.empty((n, dims), dtype=np.float32)
    with np.errstate(over="ignore"):
        for d, a in enumerate(alphas):
            vals = idx * np.uint64(a)  # wrapping u64 multiply
            out[:, d] = (vals >> np.uint64(40)).astype(np.float64) / float(1 << 24)
    return out


class SampleTables(NamedTuple):
    """Sampler stream state (pytree). Both samplers are fully
    counter-based on device — no tables are shipped; only the frame salt
    lives here (kept as a NamedTuple for pytree/API stability)."""
    frame: jnp.ndarray  # uint32 scalar, salts the streams


def build_sample_tables(settings: RenderSettings, frame: int) -> SampleTables:
    return SampleTables(jnp.uint32(frame))


# ---------------------------------------------------------------------------
# On-device R_d evaluation (exact u64 fixed point via 32-bit limbs)
# ---------------------------------------------------------------------------
# value(set, n) needs bits 40..63 of ((offset + n) * alpha) mod 2^64 with
# offset = set_base << 32 (see rd_sequence). Writing alpha = aH*2^32 + aL
# and the index as set_base*2^32 + n, those bits are (H >> 8) where
#   H = hi32(aL * n) + aL*set_base + aH*n   (mod 2^32).
# hi32 of the 32x32 product is built from 16-bit partial products, all in
# wrapping uint32 arithmetic — bit-identical to the host rd_sequence
# tables, with zero memory traffic (a 1M-ray table gather measured ~4 ms
# per set on v5e; this is pure VPU arithmetic).

_A1 = rd_alphas_u64(1)[0]
_A2 = rd_alphas_u64(2)
_M16 = 0xFFFF


def _rd_bits(alpha: int, set_base: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """(H >> 8) * 2^-24 as float32 in [0, 1)."""
    a_l = jnp.uint32(alpha & 0xFFFFFFFF)
    a_h = jnp.uint32((alpha >> 32) & 0xFFFFFFFF)
    a0 = jnp.uint32(alpha & _M16)
    a1 = jnp.uint32((alpha >> 16) & _M16)
    n = n.astype(jnp.uint32)
    n0 = n & jnp.uint32(_M16)
    n1 = n >> jnp.uint32(16)
    m00 = a0 * n0
    m01 = a0 * n1
    m10 = a1 * n0
    m11 = a1 * n1
    carry = ((m00 >> jnp.uint32(16)) + (m01 & jnp.uint32(_M16))
             + (m10 & jnp.uint32(_M16))) >> jnp.uint32(16)
    p0h = m11 + (m01 >> jnp.uint32(16)) + (m10 >> jnp.uint32(16)) + carry
    h = p0h + a_l * set_base.astype(jnp.uint32) + a_h * n
    # (h >> 8) < 2^24, so the int32 intermediate cast is exact; Mosaic
    # (the Pallas TPU lowering) has no uint32 -> float32 cast.
    return ((h >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(2.0 ** -24))


def rd_value_1d(frame: jnp.ndarray, set_id: int, n: jnp.ndarray):
    return _rd_bits(_A1, frame + jnp.uint32(set_id), n)


def rd_value_2d(frame: jnp.ndarray, num_1d_sets: int, set_id: int,
                n: jnp.ndarray):
    base = frame + jnp.uint32(num_1d_sets + set_id)
    return (_rd_bits(_A2[0], base, n), _rd_bits(_A2[1], base, n))


# ---------------------------------------------------------------------------
# PCG hash (counter-based RNG on device)
# ---------------------------------------------------------------------------

def pcg_hash(x: jnp.ndarray) -> jnp.ndarray:
    """PCG-RXS-M-XS 32-bit hash (Jarzynski & Olano, "Hash Functions for GPU
    Rendering"). Input/output uint32."""
    x = x.astype(jnp.uint32)
    x = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    x = ((x >> ((x >> jnp.uint32(28)) + jnp.uint32(4))) ^ x) * jnp.uint32(277803737)
    return (x >> jnp.uint32(22)) ^ x


def hash_combine(*words) -> jnp.ndarray:
    """Fold words into one uint32 hash: h = pcg(w0); h = pcg(h ^ w1); ..."""
    h = pcg_hash(jnp.asarray(words[0]).astype(jnp.uint32))
    for w in words[1:]:
        h = pcg_hash(h ^ jnp.asarray(w).astype(jnp.uint32))
    return h


def hash_to_unit_f32(h: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32 in [0, 1) using the top 24 bits. The int32
    intermediate cast is exact (values < 2^24) and keeps the function
    usable inside Pallas kernels (Mosaic has no u32 -> f32 cast)."""
    return ((h >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(2.0 ** -24))


# ---------------------------------------------------------------------------
# Sampler lookups (vectorized over the wavefront)
# ---------------------------------------------------------------------------

_SET_SALT_1D = 0x9E3779B9
_SET_SALT_2D = 0x85EBCA6B


def _scramble(tables: SampleTables, pixel, set_salt: int, set_id: int):
    return hash_to_unit_f32(
        hash_combine(pixel, jnp.uint32(set_salt ^ set_id), tables.frame))


def sample_1d(settings: RenderSettings, tables: SampleTables, set_id: int,
              sample_idx: jnp.ndarray, pixel: jnp.ndarray) -> jnp.ndarray:
    """One f32 in [0,1) per ray for decision dimension `set_id` (static)."""
    if settings.sampler == "hash":
        return hash_to_unit_f32(hash_combine(
            pixel, sample_idx, jnp.uint32(_SET_SALT_1D ^ set_id), tables.frame))
    base = rd_value_1d(tables.frame, set_id, sample_idx)
    scr = _scramble(tables, pixel, _SET_SALT_1D, set_id)
    return jnp.mod(base + scr, 1.0)


def sample_2d(settings: RenderSettings, tables: SampleTables, set_id: int,
              sample_idx: jnp.ndarray, pixel: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] f32 in [0,1) per ray for 2D decision `set_id` (static)."""
    if settings.sampler == "hash":
        u = hash_to_unit_f32(hash_combine(
            pixel, sample_idx, jnp.uint32(_SET_SALT_2D ^ (2 * set_id)),
            tables.frame))
        v = hash_to_unit_f32(hash_combine(
            pixel, sample_idx, jnp.uint32(_SET_SALT_2D ^ (2 * set_id + 1)),
            tables.frame))
        return jnp.stack([u, v], axis=-1)
    bu, bv = rd_value_2d(tables.frame, settings.num_1d_sets, set_id,
                         sample_idx)
    scr_u = _scramble(tables, pixel, _SET_SALT_2D, 2 * set_id)
    scr_v = _scramble(tables, pixel, _SET_SALT_2D, 2 * set_id + 1)
    base = jnp.stack([bu, bv], axis=-1)
    scr = jnp.stack([scr_u, scr_v], axis=-1)
    return jnp.mod(base + scr, 1.0)


# --- set-id helpers mirroring the layout documented above ------------------

def set1d_time() -> int:
    return 0


def set1d_light_pick(s: RenderSettings, depth: int, i: int) -> int:
    return 1 + depth * s.sets_1d_per_depth + i


def set1d_vol_pick(s: RenderSettings, depth: int, march: int, i: int) -> int:
    return 1 + depth * s.sets_1d_per_depth + s.nee_light_samples + \
        march * s.nee_light_samples + i


def set1d_vol_dist(s: RenderSettings, depth: int, march: int) -> int:
    return 1 + depth * s.sets_1d_per_depth + \
        s.nee_light_samples * (1 + s.volume_marches) + march


def set1d_fresnel(s: RenderSettings, depth: int) -> int:
    return 1 + depth * s.sets_1d_per_depth + s.sets_1d_per_depth - 2


def set1d_roulette(s: RenderSettings, depth: int) -> int:
    return 1 + depth * s.sets_1d_per_depth + s.sets_1d_per_depth - 1


def set2d_pixel_uv() -> int:
    return 0


def set2d_lens() -> int:
    return 1


def set2d_nee(s: RenderSettings, depth: int, i: int) -> int:
    return 2 + depth * s.sets_2d_per_depth + i


def set2d_vol(s: RenderSettings, depth: int, march: int, i: int) -> int:
    return 2 + depth * s.sets_2d_per_depth + s.nee_light_samples + \
        march * s.nee_light_samples + i


def set2d_diffuse(s: RenderSettings, depth: int) -> int:
    return 2 + depth * s.sets_2d_per_depth + s.sets_2d_per_depth - 2


def set2d_spec(s: RenderSettings, depth: int) -> int:
    return 2 + depth * s.sets_2d_per_depth + s.sets_2d_per_depth - 1
