#!/usr/bin/env python
"""Time ONE render_pass configuration on the live chip (single variant
per process so remote-compile time fits a bounded run; persistent
compile cache makes repeats cheap). Settings overrides are passed as
key=value args, e.g.:

    python tools/perf_pass_one.py occl_sort_steps=8 march_sort_steps=8
"""

import sys

import jax


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/rayn_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import dataclasses

    from rayn_tpu.config import RenderSettings
    from rayn_tpu.scene import presets
    sys.path.insert(0, "/root/repo/tools")
    from perf_pass import time_pass

    overrides = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=", 1)
        field = RenderSettings.__dataclass_fields__[k]
        overrides[k] = type(field.default)(v)

    res = (512, 512)
    base = RenderSettings(resolution=res, spp=128, rays_per_pass=1 << 20,
                          **overrides)
    data, static, camera = presets.default_scene(resolution=res)
    print(f"device={jax.devices()[0].device_kind} overrides={overrides}",
          flush=True)
    time_pass(str(overrides or "baseline"), base, data, static, camera)


if __name__ == "__main__":
    main()
