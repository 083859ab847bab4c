"""Multi-process (DCN analog) frame farm: two local CPU processes with a
localhost coordinator render a dealt frame range; every frame must be
bit-identical to the single-process render (frame assignment is
location-independent because samplers are salted only by frame)."""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
pid, nproc, coord, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
import jax
jax.config.update("jax_platforms", "cpu")
from rayn_tpu.parallel import distributed
distributed.init(coordinator_address=coord, num_processes=nproc,
                 process_id=pid)
assert jax.process_count() == nproc, jax.process_count()

import numpy as np
from rayn_tpu.config import RenderSettings
from rayn_tpu.scene import presets

settings = RenderSettings(resolution=(32, 24), spp=2, max_bounces=2,
                          volume_marches=1, max_marches=16,
                          max_vis_marches=8, rays_per_pass=1 << 11)
data, static, camera = presets.default_scene(resolution=(32, 24))
out = distributed.render_frames_multiprocess(
    data, static, settings, camera, frames=range(1, 5), per_chip=False)
for f, film in out:
    np.savez(os.path.join(outdir, f"frame{f}_p{pid}.npz"),
             color=np.asarray(film.color),
             samples=np.asarray(film.samples))
print("worker", pid, "rendered", [f for f, _ in out])
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_frame_farm(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = {**os.environ, "PYTHONPATH": REPO,
           "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)  # single local device per process
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(pid), "2", coord, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"

    # round-robin deal: p0 -> frames 1,3; p1 -> frames 2,4
    got = {f: f"frame{f}_p{(f - 1) % 2}.npz" for f in range(1, 5)}
    for f, name in got.items():
        assert (tmp_path / name).exists(), sorted(
            p.name for p in tmp_path.iterdir())

    # bit-identical to the single-process render of the same frames
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from rayn_tpu.config import RenderSettings
    from rayn_tpu.render import renderer
    from rayn_tpu.scene import presets

    settings = RenderSettings(resolution=(32, 24), spp=2, max_bounces=2,
                              volume_marches=1, max_marches=16,
                              max_vis_marches=8, rays_per_pass=1 << 11)
    data, static, camera = presets.default_scene(resolution=(32, 24))
    for f in (1, 2, 3, 4):
        ref = renderer.render_frame(data, static, settings, camera, frame=f)
        saved = np.load(tmp_path / got[f])
        np.testing.assert_array_equal(saved["color"], np.asarray(ref.color))
        np.testing.assert_array_equal(saved["samples"],
                                      np.asarray(ref.samples))
