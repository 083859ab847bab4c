"""rayn_tpu — a TPU-native wavefront path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the `rayn`
CPU/SIMD path tracer (reference: fu5ha/rayn). Where the reference runs
4-lane SIMD ray packets over rayon threads (reference src/ray.rs:4-29,
src/film.rs:630-658), this framework traces a *wavefront* of many thousands
of rays as flat struct-of-arrays queues living in HBM, with the bounce loop
compiled by XLA and the hot SDF sphere-marching loop implemented as a Pallas
TPU kernel. Multi-chip scaling uses `jax.sharding.Mesh` + `shard_map` with
psum film accumulation over ICI.

Feature parity targets (reference README.md:5-15):
- physically-based multi-bounce GI path tracing with Russian roulette
- BSDF importance sampling (cosine / cosine-power lobes)
- next-event estimation against sphere lights
- SDF rendering via sphere tracing with cone-traced hit thresholds
- homogeneous volumetrics (extinction + equi-angular single scattering)
- low-discrepancy (R_d) sampling with Cranley-Patterson rotation,
  plus a counter-based (hash) sampler for shardable scale
- filter importance sampling for pixel reconstruction
- depth of field (thin-lens camera), orthographic + pinhole cameras
- arbitrary animation + time-sampled motion blur
- multi-channel film / AOVs: Color, Alpha, Background, WorldNormal
"""

__version__ = "0.1.0"

from rayn_tpu.config import RenderSettings  # noqa: F401


def __getattr__(name):
    # Lazy convenience re-exports (keep `import rayn_tpu` cheap).
    if name in ("render_frame", "render_pass"):
        from rayn_tpu.render import renderer
        return getattr(renderer, name)
    if name in ("resolve", "save_channels", "new_film"):
        from rayn_tpu.render import film
        return getattr(film, name)
    if name in ("default_scene", "spheres_scene"):
        from rayn_tpu.scene import presets
        return getattr(presets, name)
    if name == "SceneBuilder":
        from rayn_tpu.scene.scene import SceneBuilder
        return SceneBuilder
    if name == "render_frame_sharded":
        from rayn_tpu.parallel.sharding import render_frame_sharded
        return render_frame_sharded
    raise AttributeError(name)
