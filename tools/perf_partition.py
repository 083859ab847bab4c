#!/usr/bin/env python
"""Cost of 1M-lane partition primitives on the live chip: which data
movement can afford to pack occlusion stragglers."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tools.perf_occl import timeit

N = 1 << 20


def main():
    key = jax.random.PRNGKey(0)
    flag = jax.random.uniform(key, (N,)) < 0.3  # "unresolved"
    data3 = jax.random.normal(key, (N, 3))
    data1 = jax.random.normal(key, (N,))
    print(f"device={jax.devices()[0].device_kind} n={N}")

    # null op: what one dispatch+readback roundtrip costs on its own
    import time as _time
    nul = jax.jit(lambda x: x[:8] + 1.0)
    _ = float(nul(data1)[0])
    t0 = _time.perf_counter()
    for _ in range(5):
        _ = float(nul(data1)[0])
    print(f"tunnel roundtrip:         "
          f"{(_time.perf_counter()-t0)/5*1e3:8.2f} ms (not subtracted "
          f"below; timeit subtracts via slope)")

    # scatter-based stable partition (current integrator.compact scheme)
    @jax.jit
    def scatter_partition(flag):
        ur = jnp.cumsum(flag.astype(jnp.int32)) - 1
        n_ur = ur[-1] + 1
        rr = jnp.cumsum((~flag).astype(jnp.int32)) - 1
        dest = jnp.where(flag, ur, n_ur + rr)
        order = jnp.zeros((N,), jnp.int32).at[dest].set(
            jnp.arange(N, dtype=jnp.int32))
        return order

    dt, order_a = timeit(scatter_partition, flag)
    print(f"scatter partition:        {dt*1e3:8.2f} ms")

    # argsort-based stable partition
    @jax.jit
    def argsort_partition(flag):
        return jnp.argsort(flag.astype(jnp.int32), stable=True)

    dt, order_b = timeit(argsort_partition, flag)
    ok = np.array_equal(np.asarray(order_a), np.asarray(order_b))
    print(f"argsort partition:        {dt*1e3:8.2f} ms  same={ok}")

    # sort_key_val of packed payload index
    @jax.jit
    def sortkv_partition(flag):
        _, order = jax.lax.sort_key_val(
            flag.astype(jnp.int32), jnp.arange(N, dtype=jnp.int32),
            is_stable=True)
        return order

    dt, order_c = timeit(sortkv_partition, flag)
    ok = np.array_equal(np.asarray(order_a), np.asarray(order_c))
    print(f"sort_key_val partition:   {dt*1e3:8.2f} ms  same={ok}")

    # dest via cumsum only (the unpack side needs no scatter/sort)
    @jax.jit
    def dest_only(flag):
        ur = jnp.cumsum(flag.astype(jnp.int32)) - 1
        n_ur = ur[-1] + 1
        rr = jnp.cumsum((~flag).astype(jnp.int32)) - 1
        return jnp.where(flag, ur, n_ur + rr)

    dt, _ = timeit(dest_only, flag)
    print(f"dest (2 cumsums):         {dt*1e3:8.2f} ms")

    # lane-permutation gather throughput (one [N] f32)
    order = order_b

    @jax.jit
    def gather1(order, a1):
        return jnp.take(a1, order)

    dt, _ = timeit(gather1, order, data1)
    print(f"1x [N] lane gather:       {dt*1e3:8.2f} ms")

    # one scatter of [N] f32 (the unpack alternative)
    @jax.jit
    def scat(order, a1):
        return jnp.zeros((N,), jnp.float32).at[order].set(a1)

    dt, _ = timeit(scat, order, data1)
    print(f"1x [N] f32 scatter:       {dt*1e3:8.2f} ms")

    # ---- ROW granularity (the affordable scheme) ----
    rows = N // 128
    a2d = data1.reshape(rows, 128)
    rflag = flag.reshape(rows, 128)[:, 0]

    @jax.jit
    def row_partition(rflag):
        ur = jnp.cumsum(rflag.astype(jnp.int32)) - 1
        n_ur = ur[-1] + 1
        rr = jnp.cumsum((~rflag).astype(jnp.int32)) - 1
        dest = jnp.where(rflag, ur, n_ur + rr)
        order = jnp.zeros((rows,), jnp.int32).at[dest].set(
            jnp.arange(rows, dtype=jnp.int32))
        return dest, order

    dt, _ = timeit(lambda f: row_partition(f)[1], rflag)
    dest_r, order_r = row_partition(rflag)
    print(f"row partition ({rows}):    {dt*1e3:8.2f} ms")

    @jax.jit
    def row_gather8(order_r, a2d):
        outs = [jnp.take(a2d * (i + 1.0), order_r, axis=0)
                for i in range(8)]
        return sum(outs)

    dt, _ = timeit(row_gather8, order_r, a2d)
    print(f"8x [rows,128] row gather: {dt*1e3:8.2f} ms")

    @jax.jit
    def row_unpack(dest_r, a2d):
        return jnp.take(a2d, dest_r, axis=0)

    dt, _ = timeit(row_unpack, dest_r, a2d)
    print(f"1x row-gather unpack:     {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
