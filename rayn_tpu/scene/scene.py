"""Scene representation and builder.

The reference scene is a `World` of boxed trait objects — hitables,
lights, materials, cameras (reference src/world.rs:7-13) built
imperatively in `setup()` (src/setup.rs:46-170). The TPU-native design
replaces dynamic dispatch with *arrays of parameters* plus integer type
tags: all spheres live in one batched animated-center store, all
materials in one tagged parameter table, all lights in one array — so
every stage of the wavefront is a dense vectorized gather instead of a
virtual call per object.

Jit interface: `SceneBuilder.build()` returns `(SceneData, SceneStatic)`;
SceneData is a pytree of arrays (donate/shard freely), SceneStatic is a
hashable dataclass passed as a static argument (it carries shape-like
facts and the SDF distance program's code).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from rayn_tpu.scene.animation import AnimChannel, sample_batched, stack_channels
from rayn_tpu.ops.sdf import SdfProgram

# Material kinds (reference src/material.rs: Lambertian :85, Dielectric
# :144, Sky :394, Emissive :451).
LAMBERT = 0
DIELECTRIC = 1
SKY = 2
EMISSIVE = 3
# Working implementations of the BSDFs the reference left as commented
# stubs (src/material.rs:259-392):
METALLIC = 4
REFRACTIVE = 5

# Material kinds that bounce light further ("receives_light" in the
# reference, src/material.rs:12-14, :426-428, :499-501).
RECEIVING_KINDS = (LAMBERT, DIELECTRIC, METALLIC, REFRACTIVE)


class Materials(NamedTuple):
    kind: jnp.ndarray      # [M] int32
    color_a: jnp.ndarray   # [M, 3] albedo / F0 (metallic) / sky top
    color_b: jnp.ndarray   # [M, 3] emission (emissive) or sky bottom
    power: jnp.ndarray     # [M] Phong exponent (dielectric/metallic)
    ior: jnp.ndarray       # [M] index of refraction (refractive)


class SceneData(NamedTuple):
    """All per-scene device arrays (pytree)."""
    sphere_centers: AnimChannel   # batched: values [K, T, 3]
    sphere_radii: jnp.ndarray     # [K]
    sphere_mats: jnp.ndarray      # [K] int32
    materials: Materials
    light_pos: AnimChannel        # batched: values [L, T, 3]
    light_radii: jnp.ndarray      # [L]
    light_emission: jnp.ndarray   # [L, 3]
    sdf_params: Any               # pytree of the SDF program's parameters
    volume_sigma_s: jnp.ndarray   # scalar f32 (0 when disabled)
    volume_sigma_t: jnp.ndarray   # scalar f32 (0 when disabled)
    # light <-> emissive-sphere pairing for MIS (RenderSettings.mis):
    sphere_light: jnp.ndarray     # [K] int32 paired light id, -1 = none
    light_paired: jnp.ndarray     # [L] f32 1.0 if the light has a pair
    # parameter pytrees of SDF instances beyond the first (SceneStatic
    # .extra_sdfs carries their static halves, in the same order)
    extra_sdf_params: Any = ()


@dataclasses.dataclass(frozen=True)
class SdfInstanceStatic:
    """Static half of an SDF instance past the first (the first lives
    in SceneStatic's sdf_* fields). The reference's HitableStore holds
    any number of TracedSDFs, each with its own material
    (src/hitable.rs:143-161, fold :170-210); all instances run through
    the fused Pallas kernels (in-kernel folds, round 5)."""
    fn: Callable
    fn_c: Optional[Callable]
    mat: int
    reduce_fn: Optional[Callable] = None
    bound_radius: float = 0.0


@dataclasses.dataclass(frozen=True)
class SceneStatic:
    """Hashable compile-time facts about the scene."""
    n_spheres: int
    n_lights: int
    n_materials: int
    has_sdf: bool
    sdf_fn: Optional[Callable]     # static dist function (hash by identity)
    sdf_fn_c: Optional[Callable]   # component-form twin (Pallas fast path)
    sdf_mat: int                   # material id of the SDF surface
    has_scattering: bool
    has_extinction: bool
    # iteration-reduction factory (SdfProgram.reduce_fn) for cheap
    # shadow-march DE variants; None = not reducible
    sdf_reduce_fn: Optional[Callable] = None
    # radius of a sphere centered at the origin that provably contains
    # the SDF's {|DE| < eps} shell; 0.0 = unknown. Lets shadow marches
    # clip segments to the bounding volume (see ops/march.py occlusion).
    sdf_bound_radius: float = 0.0
    # SDF instances beyond the first: tuple of SdfInstanceStatic, params
    # in SceneData.extra_sdf_params. All instances run through the fused
    # Pallas kernels (in-kernel closest/occlusion folds, round 5);
    # object ids follow the first SDF (n_spheres + 1 + i).
    extra_sdfs: tuple = ()
    # per-shading-point material parameters — the reference's
    # WShadingParamGenerator surface (src/material.rs:75-83): tuple of
    # (material id, fn(point [N,3], normal [N,3]) -> albedo [N,3]);
    # the fn overrides that material's color_a at each shading point.
    # Works through BOTH the unfused and fused paths (the fused kernels
    # take per-lane material parameters as inputs).
    mat_param_fns: tuple = ()

    def sdf_program(self, data: SceneData) -> SdfProgram:
        assert self.has_sdf
        return SdfProgram(self.sdf_fn, data.sdf_params, self.sdf_fn_c,
                          self.sdf_reduce_fn)

    def sdf_instances(self, data: SceneData):
        """All SDF instances as (SdfProgram, material id, bound radius)
        in object-id order (obj = n_spheres + i) — the closest-hit /
        occlusion fold domain (reference src/hitable.rs:170-210)."""
        if not self.has_sdf:
            return []
        out = [(self.sdf_program(data), self.sdf_mat,
                self.sdf_bound_radius)]
        for inst, prm in zip(self.extra_sdfs, data.extra_sdf_params):
            out.append((SdfProgram(inst.fn, prm, inst.fn_c,
                                   inst.reduce_fn),
                        inst.mat, inst.bound_radius))
        return out


def sphere_centers_at(data: SceneData, time: jnp.ndarray) -> jnp.ndarray:
    """[N, K, 3] sphere centers at each ray's time (motion blur,
    reference src/sphere.rs:49)."""
    return sample_batched(data.sphere_centers, time)


def sphere_center_of(data: SceneData, obj_idx: jnp.ndarray,
                     time: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] center of per-ray sphere obj_idx at each ray's time."""
    from rayn_tpu.scene.animation import sample_batched_at
    return sample_batched_at(data.sphere_centers, obj_idx, time)


def light_position_of(data: SceneData, light_idx: jnp.ndarray,
                      time: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] center of per-ray light light_idx at each ray's time."""
    from rayn_tpu.scene.animation import sample_batched_at
    return sample_batched_at(data.light_pos, light_idx, time)


def light_positions_at(data: SceneData, time: jnp.ndarray) -> jnp.ndarray:
    """[N, L, 3] light centers at each ray's time."""
    return sample_batched(data.light_pos, time)


def _as_channel(value) -> AnimChannel:
    if isinstance(value, AnimChannel):
        return value
    return AnimChannel.constant(np.asarray(value, np.float32))


class SceneBuilder:
    """Imperative scene construction mirroring the reference `setup()`
    surface (src/setup.rs:46-170): add materials, hitables, lights, a
    volume; `build()` freezes everything into device arrays."""

    def __init__(self):
        self._mat_kind: list[int] = []
        self._mat_a: list[np.ndarray] = []
        self._mat_b: list[np.ndarray] = []
        self._mat_power: list[float] = []
        self._mat_ior: list[float] = []
        self._sphere_centers: list[AnimChannel] = []
        self._sphere_radii: list[float] = []
        self._sphere_mats: list[int] = []
        self._light_pos: list[AnimChannel] = []
        self._light_radii: list[float] = []
        self._light_emission: list[np.ndarray] = []
        self._sdf: Optional[SdfProgram] = None
        self._sdf_mat: int = -1
        self._sdf_bound: float = 0.0
        self._extra_sdfs: list[tuple[SdfProgram, int, float]] = []
        self._mat_fns: dict[int, Callable] = {}
        self._sigma_s: Optional[float] = None
        self._sigma_t: Optional[float] = None
        self._pairs: dict[int, int] = {}  # sphere id -> light id

    # --- materials (reference src/material.rs:58-73) ----------------------
    def _add_material(self, kind, a, b, power, ior=1.0) -> int:
        self._mat_kind.append(kind)
        self._mat_a.append(np.asarray(a, np.float32))
        self._mat_b.append(np.asarray(b, np.float32))
        self._mat_power.append(float(power))
        self._mat_ior.append(float(ior))
        return len(self._mat_kind) - 1

    def add_lambertian(self, albedo) -> int:
        return self._add_material(LAMBERT, albedo, np.zeros(3), 0.0)

    def add_dielectric(self, albedo, roughness: float) -> int:
        """Roughness in [0,1]; remapped to a Phong exponent exactly as the
        reference's `Dielectric::new_remap` (src/material.rs:166-174):
        power = 1 + (1-r)^4 * 300."""
        r = 1.0 - roughness
        power = 1.0 + (r ** 4) * 300.0
        return self.add_dielectric_power(albedo, power)

    def add_dielectric_power(self, albedo, power: float) -> int:
        return self._add_material(DIELECTRIC, albedo, np.zeros(3), power)

    def add_metallic(self, f0, roughness: float) -> int:
        """Colored-Fresnel metal with a Phong specular lobe — a working
        version of the reference's commented-out Metallic
        (src/material.rs:259-322). Roughness remapped like Dielectric."""
        r = 1.0 - roughness
        power = 1.0 + (r ** 4) * 300.0
        return self._add_material(METALLIC, f0, np.zeros(3), power)

    def add_refractive(self, refract_color, roughness: float,
                       ior: float) -> int:
        """Rough glass: Fresnel-weighted reflect/refract with cosine
        lobes and total-internal-reflection fallback — a working version
        of the reference's commented-out Refractive
        (src/material.rs:324-392)."""
        return self._add_material(REFRACTIVE, refract_color, np.zeros(3),
                                  0.0, ior)

    def add_sky(self, top, bottom) -> int:
        """Vertical-gradient sky (reference src/material.rs:394-449)."""
        return self._add_material(SKY, top, bottom, 0.0)

    def add_emissive(self, emission) -> int:
        """Path-terminating emitter (reference src/material.rs:451-520)."""
        return self._add_material(EMISSIVE, np.zeros(3), emission, 0.0)

    def set_albedo_fn(self, material: int, fn: Callable) -> None:
        """Make `material`'s albedo (color_a) vary per shading point —
        the reference's generic `Material<G: WShadingParamGenerator>`
        surface (src/material.rs:75-83, consumed by get_bsdf_at
        :31-38). `fn(point [N,3], normal [N,3]) -> [N,3]` must be
        jittable and elementwise per lane. Applies wherever the
        material table's constant would be used (NEE eval, scatter,
        sky/emissive color_a uses)."""
        self._mat_fns[int(material)] = fn

    # --- hitables ----------------------------------------------------------
    def add_sphere(self, center, radius: float, material: int) -> int:
        """center: point, AnimChannel, or callable t->point (baked)."""
        self._sphere_centers.append(_as_channel(center))
        self._sphere_radii.append(float(radius))
        self._sphere_mats.append(int(material))
        return len(self._sphere_radii) - 1

    def set_sdf(self, program: SdfProgram, material: int,
                bound_radius: float = 0.0) -> None:
        """Attach THE traced SDF, replacing any previously added ones
        (reference src/sdf.rs:12-21; one TracedSDF in the default
        scene, src/setup.rs:78-86). For several SDF instances use
        `add_sdf`.

        bound_radius: optional origin-centered bounding-sphere radius
        that provably contains the SDF's hit shell ({|DE| < eps});
        enables shadow-segment bounding-volume clipping."""
        self._sdf = program
        self._sdf_mat = int(material)
        self._sdf_bound = float(bound_radius)
        self._extra_sdfs = []

    def add_sdf(self, program: SdfProgram, material: int,
                bound_radius: float = 0.0) -> int:
        """Append a traced-SDF instance with its own material — the
        reference's HitableStore holds any number of TracedSDFs
        (src/hitable.rs:143-161); closest hit folds across all of them
        (src/hitable.rs:170-210). Returns the instance's object id
        offset (0 = first). Any instance count runs the fused Pallas
        fast paths (the kernels fold closest-hit/occlusion across all
        instances in-kernel, with per-instance scalar params in SMEM);
        only non-scalar parameter leaves or a missing component-form
        fn_c fall back to the unfused fold (one-time warning)."""
        if self._sdf is None:
            self.set_sdf(program, material, bound_radius)
            return 0
        self._extra_sdfs.append(
            (program, int(material), float(bound_radius)))
        return len(self._extra_sdfs)

    # --- lights (reference src/light.rs:19-34) -----------------------------
    def add_sphere_light(self, pos, radius: float, emission) -> int:
        self._light_pos.append(_as_channel(pos))
        self._light_radii.append(float(radius))
        self._light_emission.append(np.asarray(emission, np.float32))
        return len(self._light_radii) - 1

    def pair_light(self, light: int, sphere: int) -> None:
        """Declare that sphere `sphere` (an emissive hitable) is the
        visible body of sphere light `light`. With RenderSettings.mis the
        pair is treated as one emitter: NEE (toward the light) and BSDF
        hits (on the sphere) are power-heuristic weighted instead of
        double-counted. Co-located constant-position pairs are also
        auto-detected at build()."""
        self._pairs[int(sphere)] = int(light)

    # --- volume (reference src/volume.rs:1-5) ------------------------------
    def set_volume(self, coeff_scattering: Optional[float],
                   coeff_extinction: Optional[float]) -> None:
        self._sigma_s = coeff_scattering
        self._sigma_t = coeff_extinction

    # -----------------------------------------------------------------------
    def build(self) -> tuple[SceneData, SceneStatic]:
        if not self._mat_kind:
            raise ValueError("scene has no materials")
        k = len(self._sphere_radii)
        centers = stack_channels(self._sphere_centers) if k else AnimChannel(
            jnp.zeros((0, 1, 3)), jnp.float32(0), jnp.float32(1))
        n_lights = len(self._light_radii)
        lpos = stack_channels(self._light_pos) if n_lights else AnimChannel(
            jnp.zeros((0, 1, 3)), jnp.float32(0), jnp.float32(1))

        # Light <-> emissive-sphere pairing for MIS: explicit pair_light
        # calls, plus auto-detection of co-located pairs (an emissive
        # sphere whose animated center matches a light's position, the
        # reference scene's construction, src/setup.rs:107-122).
        sphere_light = np.full((k,), -1, np.int32)
        for sph, lt in self._pairs.items():
            sphere_light[sph] = lt
        for sph in range(k):
            if sphere_light[sph] >= 0:
                continue
            if self._mat_kind[self._sphere_mats[sph]] != EMISSIVE:
                continue
            c = self._sphere_centers[sph]
            for lt in range(n_lights):
                p = self._light_pos[lt]
                if (np.asarray(c.values).shape == np.asarray(p.values).shape
                        and np.allclose(c.values, p.values)
                        and np.allclose(c.t0, p.t0)
                        and np.allclose(c.t1, p.t1)):
                    sphere_light[sph] = lt
                    break
        light_paired = np.zeros((n_lights,), np.float32)
        light_paired[sphere_light[sphere_light >= 0]] = 1.0

        materials = Materials(
            kind=jnp.asarray(self._mat_kind, jnp.int32),
            color_a=jnp.asarray(np.stack(self._mat_a)),
            color_b=jnp.asarray(np.stack(self._mat_b)),
            power=jnp.asarray(self._mat_power, jnp.float32),
            ior=jnp.asarray(self._mat_ior, jnp.float32),
        )
        data = SceneData(
            sphere_centers=centers,
            sphere_radii=jnp.asarray(self._sphere_radii, jnp.float32),
            sphere_mats=jnp.asarray(self._sphere_mats, jnp.int32),
            materials=materials,
            light_pos=lpos,
            light_radii=jnp.asarray(self._light_radii, jnp.float32),
            light_emission=jnp.asarray(
                np.stack(self._light_emission) if n_lights
                else np.zeros((0, 3), np.float32)),
            sdf_params=self._sdf.params if self._sdf else (),
            volume_sigma_s=jnp.float32(self._sigma_s or 0.0),
            volume_sigma_t=jnp.float32(self._sigma_t or 0.0),
            sphere_light=jnp.asarray(sphere_light),
            light_paired=jnp.asarray(light_paired),
            extra_sdf_params=tuple(p.params for p, _m, _b
                                   in self._extra_sdfs),
        )
        static = SceneStatic(
            n_spheres=k,
            n_lights=n_lights,
            n_materials=len(self._mat_kind),
            has_sdf=self._sdf is not None,
            sdf_fn=self._sdf.fn if self._sdf else None,
            sdf_fn_c=self._sdf.fn_c if self._sdf else None,
            sdf_mat=self._sdf_mat,
            has_scattering=self._sigma_s is not None,
            has_extinction=self._sigma_t is not None,
            sdf_reduce_fn=self._sdf.reduce_fn if self._sdf else None,
            sdf_bound_radius=self._sdf_bound,
            extra_sdfs=tuple(
                SdfInstanceStatic(fn=p.fn, fn_c=p.fn_c, mat=m,
                                  reduce_fn=p.reduce_fn, bound_radius=b)
                for p, m, b in self._extra_sdfs),
            mat_param_fns=tuple(sorted(self._mat_fns.items())),
        )
        return data, static
