#!/usr/bin/env python
"""Tunnel-phase probe (BENCH_NOTES r4 'decode wall ladder'): quantify the
remote-TPU link's CURRENT health before trusting wall-clock numbers.

Reports three signals with known healthy bands (r3/r4 measurements):
  - trivial-jit compile wall   (healthy: < 10 s; pathological: 200 s+)
  - per-dispatch round trip    (healthy: ~20-30 ms)
  - 16 MB device_put           (healthy: ~45-180 ms)

Run:  timeout 600 python scripts/phase_probe.py
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"[probe] device: {dev}", flush=True)

    x = jnp.arange(8.0)
    t0 = time.perf_counter()
    y = jax.jit(lambda a: a * float(time.time_ns() % 97 + 2))(x)
    jax.block_until_ready(y)
    compile_s = time.perf_counter() - t0
    print(f"[probe] trivial jit compile+run: {compile_s:.1f} s", flush=True)

    f = jax.jit(lambda a: a + 1.0)
    y = f(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(20):
        y = f(y)
        jax.block_until_ready(y)
    rtt_ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"[probe] per-dispatch RTT: {rtt_ms:.1f} ms", flush=True)

    big = np.zeros((16 * 1024 * 1024 // 4,), np.float32)
    jax.block_until_ready(jax.device_put(big))  # warm any allocator path
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(big))
    put_ms = (time.perf_counter() - t0) * 1e3
    print(f"[probe] 16 MB device_put: {put_ms:.0f} ms", flush=True)

    healthy = compile_s < 15 and rtt_ms < 60 and put_ms < 400
    print(f"[probe] phase: {'HEALTHY' if healthy else 'DEGRADED'}", flush=True)
    return 0 if healthy else 1


if __name__ == "__main__":
    raise SystemExit(main())
