"""Multi-process (DCN) frame farm.

The reference is a single process; its only frame loop is sequential
(reference src/main.rs:47-58). Scaling past one host/slice on TPU means
crossing DCN, where the scaling-book recipe is: keep DCN traffic at the
*frame* granularity (embarrassingly parallel), keep ICI for the
intra-frame work. This module deals frames round-robin across
`jax.distributed` processes; within a process, frames go one-per-chip
over the local mesh (rayn_tpu.parallel.sharding.render_frames_per_chip)
or sequentially on one device. Nothing crosses DCN except the
coordination handshake — every process writes its own frames' PNGs, and
the per-frame images are bit-identical to the single-process
`renderer.render_frame` output (counter-based samplers are salted only
by the frame number, so frame assignment is location-independent).

CPU-testable: two local processes with a 127.0.0.1 coordinator exercise
the full path (tests/test_distributed.py), the standard JAX trick for
multi-host code without a cluster.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op if already initialized or if
    running single-process with no coordinator given)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def frames_for_process(frames: Sequence[int], process_id: int,
                       num_processes: int) -> list[int]:
    """Round-robin frame deal: process p renders frames[p::P]."""
    return list(frames)[process_id::num_processes]


def render_frames_multiprocess(data, static, settings, camera,
                               frames: Sequence[int],
                               process_id: Optional[int] = None,
                               num_processes: Optional[int] = None,
                               per_chip: bool = True,
                               filter=None, frame_rate: float = 24.0,
                               shutter_speed: float = 1.0 / 24.0):
    """Render this process's share of `frames`.

    Returns a list of (frame_index, Film) for the local share. The
    caller saves them (PNG writing stays process-local — frame-level
    parallelism keeps DCN out of the pixel path entirely).
    """
    pid = jax.process_index() if process_id is None else process_id
    nproc = jax.process_count() if num_processes is None else num_processes
    mine = frames_for_process(frames, pid, nproc)
    if not mine:
        return []

    local = jax.local_devices()
    if per_chip and len(local) > 1:
        from rayn_tpu.parallel import sharding
        import numpy as np
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(local), ("frame",))
        films = sharding.render_frames_per_chip(
            data, static, settings, camera, mine, mesh=mesh,
            filter=filter, frame_rate=frame_rate,
            shutter_speed=shutter_speed)
    else:
        from rayn_tpu.render import renderer
        films = [renderer.render_frame(
            data, static, settings, camera, frame=f, filter=filter,
            frame_rate=frame_rate, shutter_speed=shutter_speed)
            for f in mine]
    return list(zip(mine, films))
