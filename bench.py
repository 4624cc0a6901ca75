"""Benchmark: batched Ed25519 verification throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the north-star target of 10M verifies/sec
on a 16-chip v5e (BASELINE.md), i.e. 625k verifies/sec/chip == 1.0.

Robustness (this harness must never end a round with no number): each
measurement runs in a child process with a hard timeout, so an XLA
remote-compile hang or crash at one batch size cannot take down the whole
run. The parent walks a fallback ladder — flagship verify at descending
batch sizes, then cheaper metrics (x25519, field mul) — and always emits a
JSON line on stdout with rc=0.
"""

import json
import os
import subprocess
import sys
import time

CACHE_DIR = "/tmp/eccoxide_tpu_jax_cache"
TARGET_PER_CHIP = 625000.0  # 10M / 16 chips (BASELINE.md north star)


def _setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    return jax


def _chain_time(step, x0, fetch, k_short=4, k_long=36):
    """True per-call device time via dependency chaining.

    On the remote (axon-tunnelled) backend, ``block_until_ready`` returns
    before the device has actually executed (measured: an 8192^3 bf16
    matmul "completes" in 0.1ms against a >=2.8ms roofline), so naive
    per-call timing is a dispatch-latency illusion. The honest method:
    chain K dispatches through a data dependency (call i+1 consumes call
    i's output), force the final result to the host with a real transfer,
    and difference two chain lengths so fixed overhead (dispatch, the one
    d2h sync) cancels:  per_call = (T(k_long) - T(k_short)) / (k_long -
    k_short).
    """
    x = step(x0)
    fetch(x)  # compile finished + one real sync
    totals = {}
    for K in (k_short, k_long):
        x = x0
        t0 = time.perf_counter()
        for _ in range(K):
            x = step(x)
        fetch(x)
        totals[K] = time.perf_counter() - t0
    dt = (totals[k_long] - totals[k_short]) / (k_long - k_short)
    return max(dt, 1e-9), totals


def run_verify(B: int) -> dict:
    """Flagship metric: batched Ed25519 verify throughput on one chip.

    Data prep is pure host (oracle-signed vectors tiled to B — the kernel
    is constant-time, so repeated rows cannot change per-element work);
    timing is dependency-chained (_chain_time); correctness is checked on
    the untimed warmup output.
    """
    jax = _setup_jax()
    import random

    import jax.numpy as jnp
    import numpy as np

    from eccoxide_tpu.oracle import ed25519 as orc
    from eccoxide_tpu.protocol.ed25519 import (
        device_tables_verify, sha512_batch_host, verify_core,
    )

    n_distinct = min(B, 128)
    rng = random.Random(1234)
    sks = [bytes(rng.randrange(256) for _ in range(32))
           for _ in range(n_distinct)]
    msgs = [bytes(rng.randrange(256) for _ in range(32))
            for _ in range(n_distinct)]
    pks = [orc.public_key(sk) for sk in sks]
    sigs = [orc.sign(sk, m) for sk, m in zip(sks, msgs)]
    rs = [s[:32] for s in sigs]
    ss = [s[32:] for s in sigs]
    kw = sha512_batch_host(
        [r + pk + m for r, pk, m in zip(rs, pks, msgs)]
    ).astype(np.int32)

    def cols(bs):
        return np.stack(
            [np.frombuffer(b, np.uint8) for b in bs], axis=1
        ).astype(np.int32)

    reps = -(-B // n_distinct)  # ceil

    def tile(a):
        return jnp.asarray(np.tile(a, (1, reps))[:, :B])

    pkb, rb, sb = tile(cols(pks)), tile(cols(rs)), tile(cols(ss))
    kwb = tile(kw)
    tabs = device_tables_verify()

    # correctness on the raw core first (untimed)
    ok = jax.jit(verify_core)(pkb, rb, sb, kwb, tabs)
    if not bool(np.asarray(ok).all()):
        return {"metric": "ed25519_verify_per_sec_chip", "value": 0,
                "unit": "ops/s", "vs_baseline": 0.0,
                "error": "verification incorrect"}

    # chained step: next pk depends on this call's ok mask (a no-op
    # numerically: ok is all-ones, (pk + ok - 1) == pk, stays in range).
    # Everything else rides as explicit args — closure-captured device
    # arrays poison compile AND runtime on this backend (measured 200x).
    def _step(pk, rb, sb, kwb, tabs):
        ok = verify_core(pk, rb, sb, kwb, tabs)
        return pk + ok.astype(jnp.int32)[None] - 1

    jstep = jax.jit(_step)

    def step(pk):
        return jstep(pk, rb, sb, kwb, tabs)

    dt, totals = _chain_time(step, pkb, lambda x: np.asarray(x[0, 0]))
    rate = B / dt
    return {"metric": "ed25519_verify_per_sec_chip", "value": round(rate, 1),
            "unit": "ops/s", "vs_baseline": round(rate / TARGET_PER_CHIP, 4),
            "batch": B, "sec_per_batch": round(dt, 6),
            "chain_totals_s": {str(k): round(v, 3)
                               for k, v in totals.items()}}


def run_rlc(B: int) -> dict:
    """RLC batch verification (protocol/ed25519_batch.py): one Pippenger
    MSM pair + one fixed-base comb per batch instead of B Straus chains.
    Same observable accept/reject semantics as verify_core (w.h.p.); the
    candidate replacement flagship once measured faster."""
    jax = _setup_jax()
    import random

    import jax.numpy as jnp
    import numpy as np

    from eccoxide_tpu.oracle import ed25519 as orc
    from eccoxide_tpu.protocol import ed25519 as base
    from eccoxide_tpu.protocol.ed25519_batch import rlc_verify_core, sample_z

    n_distinct = min(B, 128)
    rng = random.Random(1234)
    sks = [bytes(rng.randrange(256) for _ in range(32))
           for _ in range(n_distinct)]
    msgs = [bytes(rng.randrange(256) for _ in range(32))
            for _ in range(n_distinct)]
    pks = [orc.public_key(sk) for sk in sks]
    sigs = [orc.sign(sk, m) for sk, m in zip(sks, msgs)]
    rs = [s[:32] for s in sigs]
    ss = [s[32:] for s in sigs]
    kw = base.sha512_batch_host(
        [r + pk + m for r, pk, m in zip(rs, pks, msgs)]
    ).astype(np.int32)

    def cols(bs):
        return np.stack(
            [np.frombuffer(b, np.uint8) for b in bs], axis=1
        ).astype(np.int32)

    reps = -(-B // n_distinct)

    def tile(a):
        return jnp.asarray(np.tile(a, (1, reps))[:, :B])

    pkb, rb, sb = tile(cols(pks)), tile(cols(rs)), tile(cols(ss))
    kwb = tile(kw)
    zb = jnp.asarray(sample_z(B, np.random.default_rng(5)))
    tabs = base.device_tables()
    msm_c = 8 if B >= 4096 else 4
    from functools import partial

    core = jax.jit(partial(rlc_verify_core, msm_c=msm_c))

    ok = core(pkb, rb, sb, kwb, zb, tabs)
    if not bool(np.asarray(ok)):
        return {"metric": "ed25519_verify_per_sec_chip", "value": 0,
                "unit": "ops/s", "vs_baseline": 0.0,
                "error": "rlc batch verification incorrect"}

    def _step(pk, rb, sb, kwb, zb, tabs):
        ok = rlc_verify_core(pk, rb, sb, kwb, zb, tabs, msm_c=msm_c)
        return pk + ok.astype(jnp.int32) - 1

    jstep = jax.jit(_step)

    def step(pk):
        return jstep(pk, rb, sb, kwb, zb, tabs)

    dt, totals = _chain_time(step, pkb, lambda x: np.asarray(x[0, 0]))
    rate = B / dt
    return {"metric": "ed25519_verify_per_sec_chip", "value": round(rate, 1),
            "unit": "ops/s", "vs_baseline": round(rate / TARGET_PER_CHIP, 4),
            "batch": B, "sec_per_batch": round(dt, 6), "method": "rlc_batch",
            "chain_totals_s": {str(k): round(v, 3)
                               for k, v in totals.items()}}


def run_x25519(B: int) -> dict:
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from eccoxide_tpu.protocol import x25519 as px

    rng = np.random.default_rng(7)
    sb = jnp.asarray(rng.integers(0, 256, size=(32, B), dtype=np.int32))
    ub = jnp.asarray(rng.integers(0, 256, size=(32, B), dtype=np.int32))
    fn = jax.jit(px.x25519)

    def step(u):  # chain: next u = this call's shared-secret bytes
        return fn(sb, u)

    dt, _ = _chain_time(step, ub, lambda x: np.asarray(x[0, 0]))
    return {"metric": "x25519_per_sec_chip", "value": round(B / dt, 1),
            "unit": "ops/s", "vs_baseline": 0.0, "batch": B,
            "sec_per_batch": round(dt, 6)}


def run_fieldmul(B: int) -> dict:
    """Field-mul throughput via an ON-DEVICE dependency chain: K muls run
    inside one jitted fori_loop (loop-carried z <- z*y), so the device
    must execute them serially regardless of host dispatch pipelining.
    (The host-side chained variant measured dt ~ 0 here: per-call device
    time is far below the axon backend's dispatch pipeline depth.)"""
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from eccoxide_tpu.curves import curve25519 as c255

    f = c255.FQ
    rng = np.random.default_rng(7)
    xs = jnp.asarray(rng.integers(0, f.mask, size=(f.n, B), dtype=np.int32))
    ys = jnp.asarray(rng.integers(0, f.mask, size=(f.n, B), dtype=np.int32))

    def chain(K):
        def fn(z, y):
            return jax.lax.fori_loop(0, K, lambda i, a: f.mul(a, y), z)

        return jax.jit(fn, static_argnums=())

    k_short, k_long = 64, 1088
    fshort, flong = chain(k_short), chain(k_long)
    np.asarray(fshort(xs, ys))  # compile both
    np.asarray(flong(xs, ys))
    totals = {}
    for name, fn in (("s", fshort), ("l", flong)):
        trials = []
        for _ in range(3):  # min-of-3: the first post-compile call can be
            t0 = time.perf_counter()  # 30x slower (allocator warmup)
            np.asarray(fn(xs, ys)[0, 0])
            trials.append(time.perf_counter() - t0)
        totals[name] = min(trials)
    dt = max((totals["l"] - totals["s"]) / (k_long - k_short), 1e-9)
    return {"metric": "field_mul_25519_per_sec_chip",
            "value": round(B / dt, 1), "unit": "ops/s", "vs_baseline": 0.0,
            "batch": B, "sec_per_batch": round(dt, 9)}


CHILD_MODES = {"verify": run_verify, "rlc": run_rlc, "x25519": run_x25519,
               "fieldmul": run_fieldmul}


def _child(mode: str, B: int) -> int:
    try:
        rec = CHILD_MODES[mode](B)
    except Exception as e:  # noqa: BLE001 — report, parent falls back
        print(json.dumps({"error": f"{type(e).__name__}: {e}"[:400]}))
        return 1
    print(json.dumps(rec))
    return 0


def _try(mode: str, B: int, timeout_s: int):
    """Run one measurement in a child process; returns dict or None."""
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)
    try:
        cp = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode,
             str(B)],
            capture_output=True, text=True, timeout=timeout_s, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        print(f"# {mode} B={B}: timeout after {timeout_s}s", file=sys.stderr)
        return None
    for line in reversed(cp.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "error" in rec and "metric" not in rec:
            print(f"# {mode} B={B}: {rec['error']}", file=sys.stderr)
            return None
        return rec
    tail = (cp.stderr or "")[-300:]
    print(f"# {mode} B={B}: rc={cp.returncode} no JSON; stderr tail: {tail}",
          file=sys.stderr)
    return None


def main():
    if len(sys.argv) >= 4 and sys.argv[1] == "--child":
        sys.exit(_child(sys.argv[2], int(sys.argv[3])))

    # explicit batch: single in-process run (manual experimentation)
    if len(sys.argv) > 1:
        print(json.dumps(run_verify(int(sys.argv[1]))))
        return

    # Bank-first ladder (round-3 lesson: three rounds ended with NO number
    # because the flagship's cold compile ate the whole driver budget).
    # Cheap, guaranteed-compilable metrics run FIRST and are banked; the
    # flagship then upgrades the banked record if it lands within the
    # remaining budget. Cold-cache timings measured on the axon TPU chip:
    # fieldmul ~60s, x25519 ~180s, verify(B=64) ~330s end-to-end
    # (59s trace + 247s XLA compile + run), so one 580s flagship attempt
    # fits after the cheap rungs inside a ~1500s driver budget.
    budget_s = float(os.environ.get("ECCOXIDE_BENCH_BUDGET_S", "1500"))
    t_start = time.time()

    def remaining():
        return budget_s - (time.time() - t_start)

    best = [None]  # (priority, rec); higher priority wins

    def bank(prio, rec):
        if rec is None or "metric" not in rec:
            return
        if best[0] is None or prio > best[0][0] or (
            prio == best[0][0]
            and rec.get("value", 0) > best[0][1].get("value", 0)
        ):
            best[0] = (prio, rec)
            # Stream the best-so-far record IMMEDIATELY: if an outer
            # (driver-side) timeout kills this process mid-flagship, the
            # last JSON line on stdout is still a real banked number
            # (round-3 failure mode: bench was killed before its one
            # final print, so the round recorded nothing).
            print(json.dumps(rec), flush=True)

    bank(0, _try("fieldmul", 8192, int(min(300, max(remaining() - 20, 60)))))
    if remaining() > 300:
        bank(1, _try("x25519", 1024, int(min(420, remaining() - 20))))
    # flagship: measured clean cold end-to-end 844s at B=32768 (compile
    # dominates and grows with batch), so the first attempt gets a 900s
    # window; smaller batches compile faster and act as the fallback.
    for B, cap in ((32768, 900), (8192, 580), (4096, 520), (256, 400)):
        tmo = min(float(cap), remaining() - 15)
        if tmo < 240:
            break
        rec = _try("verify", B, int(tmo))
        if rec is not None:
            bank(2, rec)
            break
    if best[0] is not None:
        print(json.dumps(best[0][1]), flush=True)
        return
    print(json.dumps({"metric": "ed25519_verify_per_sec_chip", "value": 0,
                      "unit": "ops/s", "vs_baseline": 0.0,
                      "error": "all fallback measurements failed"}))


if __name__ == "__main__":
    main()
