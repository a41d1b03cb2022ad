"""Host<->device link budget on the tunneled device: dispatch floor,
upload and readback bandwidth per transfer size, f32 vs f64.

Feeds the itemized transfer budget in docs/PERFORMANCE.md (the round-3
verdict asked for dispatch-count x floor + bytes/bandwidth accounting of
the full Driver.iterate wall-clock)."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def bump(x):
    return x + 1


def measure_floor(reps=20):
    x = jnp.zeros((8,), jnp.float32)
    _ = np.asarray(bump(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(bump(x))
    return (time.perf_counter() - t0) / reps


def measure_upload(nbytes, dtype, reps=5):
    n = nbytes // np.dtype(dtype).itemsize
    host = [np.random.rand(n).astype(dtype) for _ in range(reps)]
    dev = jax.devices()[0]
    _ = jax.device_put(host[0], dev).block_until_ready()
    t0 = time.perf_counter()
    for h in host:
        _ = jax.device_put(h, dev).block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return dt


def measure_readback(nbytes, dtype, reps=5):
    n = nbytes // np.dtype(dtype).itemsize
    x = jax.device_put(np.random.rand(n).astype(dtype))
    x.block_until_ready()
    _ = np.asarray(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(bump(x))
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    floor = measure_floor()
    out = {"dispatch_floor_s": round(floor, 4), "transfers": []}
    for mb in (1, 4, 16):
        for dt in (np.float32, np.float64):
            up = measure_upload(mb << 20, dt)
            down = measure_readback(mb << 20, dt)
            out["transfers"].append({
                "mb": mb, "dtype": np.dtype(dt).name,
                "upload_s": round(up, 4),
                "upload_MBps": round(mb / up, 1),
                "readback_s": round(down, 4),
                "readback_MBps": round(mb / max(down - floor, 1e-9), 1)})
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
