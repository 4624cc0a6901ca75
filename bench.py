"""Benchmark: batched Ed25519 verification throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the north-star target of 10M verifies/sec
on a 16-chip v5e (BASELINE.md), i.e. 625k verifies/sec/chip == 1.0.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_verify_batch
    from eccoxide_tpu.protocol.ed25519 import verify_core

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    pk, r, s, kw = _example_verify_batch(B)
    args = tuple(jnp.asarray(a) for a in (pk, r, s, kw))

    vfn = jax.jit(verify_core)
    out = vfn(*args)
    out.block_until_ready()
    if not bool(np.asarray(out).all()):
        print(json.dumps({"metric": "ed25519_verify_per_sec", "value": 0,
                          "unit": "ops/s", "vs_baseline": 0.0,
                          "error": "verification incorrect"}))
        return

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = vfn(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    rate = B / dt
    print(json.dumps({
        "metric": "ed25519_verify_per_sec_chip",
        "value": round(rate, 1),
        "unit": "ops/s",
        "vs_baseline": round(rate / 625000.0, 4),
        "batch": B,
        "sec_per_batch": round(dt, 4),
    }))


if __name__ == "__main__":
    main()
