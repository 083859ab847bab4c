#!/usr/bin/env python
"""Minimal repro of XLA's benign 'Algebraic simplifier is likely stuck
in a circular simplification loop' warning (docs/ROUND3_NOTES.md,
VERDICT round-2 item 7).

Trigger = camera.generate's traced-scalar broadcast-mul chains feeding
a while-loop consumer (the closest-hit march). Run with
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_COMPILATION_CACHE_DIR= \
      python tools/repro_algsimp_loop.py
and watch stderr; add
  XLA_FLAGS="--xla_dump_to=/tmp/xdump --xla_dump_hlo_pass_re=algsimp"
to see the broadcast/mul growth inside the algsimp invocation.
Replacing camera.generate's output with same-shaped constants makes the
warning disappear (see the notes for the full bisection table)."""
import jax
import jax.numpy as jnp

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import intersect
from rayn_tpu.render import renderer
from rayn_tpu.scene import presets
from rayn_tpu.utils import rng

res = (32, 24)
n = 1024
settings = RenderSettings(resolution=res, spp=2, max_marches=24,
                          max_vis_marches=16, rays_per_pass=n)
data, static, camera = presets.default_scene(resolution=res)
tables = rng.build_sample_tables(settings, frame=1)


def f():
    idx = renderer.ray_indices(jnp.int32(0), n)
    u01 = (idx.astype(jnp.float32) + 0.5) / n
    ndc = jnp.stack([u01, 1.0 - u01], -1)
    tm = jnp.zeros((n,))
    lens = jnp.stack([u01, u01], -1)
    o, d = camera.generate(ndc, tm, lens)
    t_max = jnp.full((n,), 200.0)
    hps = jnp.zeros((n,))
    act = jnp.ones((n,), bool)
    return intersect.closest_hit(data, static, settings, o, d, tm,
                                 t_max, hps, hps, act)


if __name__ == "__main__":
    jax.block_until_ready(jax.jit(f)())
    print("compiled + ran; check stderr above for the (benign) "
          "circular-simplification warning")
