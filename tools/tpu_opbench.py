"""TPU VPU/MXU op-rate microbenchmark — the measurement behind ROOFLINE.md.

Measures elementwise op throughput (int32 multiply vs f32 multiply/FMA,
shift/mask vs floor-based carry steps) and MXU matmul rates (bf16, f32,
int8) on the real chip, using dependency-chained timing (the axon remote
backend returns from block_until_ready before execution completes, so only
chained timing with a real host fetch is trustworthy — see bench.py
_chain_time).

Usage:  python tools/tpu_opbench.py [N]     (default N = 4096)
Prints one JSON line per measurement.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/eccoxide_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

INNER = 32  # dependent ops inside one jitted call


def chain_time(step, x0, k_short=3, k_long=19):
    x = step(x0)
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])  # compile + sync
    totals = {}
    for K in (k_short, k_long):
        x = x0
        t0 = time.perf_counter()
        for _ in range(K):
            x = step(x)
        np.asarray(jax.tree.leaves(x)[0].ravel()[0])
        totals[K] = time.perf_counter() - t0
    return max((totals[k_long] - totals[k_short]) / (k_long - k_short), 1e-9)


def elementwise(name, make_body, dtype, N, init=None, extra=0):
    """make_body(y) -> f(x) applied INNER times inside jit; reports
    Gop/s counting 1 op per element per application (+extra)."""
    rng = np.random.default_rng(0)
    if dtype == jnp.int32:
        x0 = jnp.asarray(rng.integers(1, 1 << 15, (N, N), np.int32))
        y = jnp.asarray(rng.integers(1, 1 << 15, (N, N), np.int32) | 1)
    else:
        x0 = jnp.asarray(rng.uniform(1.0, 2.0, (N, N)).astype(np.float32))
        y = jnp.asarray(rng.uniform(0.5, 1.0, (N, N)).astype(np.float32))
    body = make_body(y)

    @jax.jit
    def step(x):
        for _ in range(INNER):
            x = body(x)
        return x

    dt = chain_time(step, x0)
    ops = N * N * INNER * (1 + extra)
    print(json.dumps({"op": name, "gops": round(ops / dt / 1e9, 2),
                      "ms_per_call": round(dt * 1e3, 4)}))


def matmul(name, dtype, N, acc=None):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a0 = jnp.asarray(rng.integers(-4, 4, (N, N), np.int8))
        b = jnp.asarray(rng.integers(-4, 4, (N, N), np.int8))
    else:
        a0 = jnp.asarray(rng.uniform(-1, 1, (N, N))).astype(dtype)
        b = jnp.asarray(rng.uniform(-1e-3, 1e-3, (N, N))).astype(dtype)

    @jax.jit
    def step(a):
        out = jax.lax.dot(a.astype(dtype), b,
                          preferred_element_type=acc or dtype)
        return out.astype(dtype) if acc else out

    try:
        dt = chain_time(step, a0, 2, 10)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"op": name, "error": str(e)[:200]}))
        return
    print(json.dumps({"op": name, "tops": round(2 * N**3 / dt / 1e12, 2),
                      "ms_per_call": round(dt * 1e3, 4)}))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    mask = np.int32(8191)
    elementwise("i32_mul_mask", lambda y: lambda x: (x * y) & mask,
                jnp.int32, N)
    elementwise("i32_add", lambda y: lambda x: (x + y) & mask, jnp.int32, N)
    elementwise("i32_shift_mask",
                lambda y: lambda x: ((x >> 8) & mask) + (x & 255),
                jnp.int32, N)
    elementwise("f32_mul", lambda y: lambda x: x * y + 1.0, jnp.float32, N)
    elementwise("f32_fma", lambda y: lambda x: x * 0.5 + y, jnp.float32, N)
    elementwise("f32_floorcarry",
                lambda y: lambda x: (x - jnp.floor(x * (1.0 / 256.0)) * 256.0)
                + y,
                jnp.float32, N)
    elementwise("f32_to_i32_cast_rt",
                lambda y: lambda x: x.astype(jnp.int32).astype(jnp.float32)
                * 0.5 + y,
                jnp.float32, N)
    matmul("matmul_bf16", jnp.bfloat16, N)
    matmul("matmul_f32", jnp.float32, N)
    matmul("matmul_i8_i32", jnp.int8, min(N, 2048), acc=jnp.int32)


if __name__ == "__main__":
    main()
