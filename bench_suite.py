"""Full benchmark matrix — the divan-suite equivalent.

Recreates the reference's microbenchmark surface (/root/reference/benches/:
curves.rs field/scalar/point matrices, curve25519.rs, x25519.rs,
ed25519.rs, curve448.rs, x448.rs) as batched throughput numbers
(ops/sec/chip at a given batch size). Prints one JSON line per metric.

Usage: python bench_suite.py [batch] [--curves p256r1,p256k1,...]
"""

import json
import sys
import time

import numpy as np


def _bench(fn, args, reps=3):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / reps


def jax_block(x):
    import jax

    for leaf in jax.tree.leaves(x):
        leaf.block_until_ready()


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/eccoxide_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rng = np.random.default_rng(1)

    results = []

    def emit(metric, secs, unit="ops/s"):
        rate = B / secs
        rec = {"metric": metric, "value": round(rate, 1), "unit": unit,
               "batch": B, "sec": round(secs, 5)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # ---- field matrix (reference benches/curves.rs:107-228) ----
    from eccoxide_tpu.curves import sec2
    from eccoxide_tpu.curves import curve25519 as c255
    from eccoxide_tpu.curves import curve448 as c448

    field_targets = {
        "p256r1": sec2.get_curve("p256r1").field,
        "p256k1": sec2.get_curve("p256k1").field,
        "p384r1": sec2.get_curve("p384r1").field,
        "p521r1": sec2.get_curve("p521r1").field,
        "curve25519": c255.FQ,
        "curve448": c448.FQ,
    }
    for name, f in field_targets.items():
        xs = jnp.asarray(
            rng.integers(0, f.mask, size=(f.n, B), dtype=np.int32)
        )
        ys = jnp.asarray(
            rng.integers(0, f.mask, size=(f.n, B), dtype=np.int32)
        )
        mul = jax.jit(f.mul)
        emit(f"field_mul_{name}", _bench(mul, (xs, ys)))
        add = jax.jit(f.add)
        emit(f"field_add_{name}", _bench(add, (xs, ys)))
        inv = jax.jit(f.inverse)
        emit(f"field_inverse_{name}", _bench(inv, (xs,)))
        sq = jax.jit(f.square)
        emit(f"field_square_{name}", _bench(sq, (xs,)))

    # ---- point ops (reference benches/curves.rs:231-307) ----
    for cname in ["p256r1", "p256k1"]:
        spec = sec2.get_curve(cname)
        G = spec.generator((B,))
        addf = jax.jit(lambda P: spec.add(P, P))
        emit(f"point_add_{cname}", _bench(addf, (G,)))
        dblf = jax.jit(spec.double)
        emit(f"point_double_{cname}", _bench(dblf, (G,)))
        nw = -(-spec.scalar.bits // 4)
        w = jnp.asarray(
            rng.integers(0, 16, size=(nw, B), dtype=np.int32)
        )
        smul = jax.jit(lambda w_: spec.scalar_mul(spec.generator((B,)), w_))
        emit(f"scalar_mul_{cname}", _bench(smul, (w,)))
        sb = jnp.asarray(
            rng.integers(0, 256, size=(spec.scalar.n_bytes, B), dtype=np.int32)
        )
        from eccoxide_tpu.params.comb import get_weierstrass_comb

        wtabs = tuple(
            jax.device_put(t) for t in get_weierstrass_comb(spec).tables()
        )
        mb = jax.jit(spec.mul_base)
        emit(f"mul_base_{cname}", _bench(mb, (sb, wtabs)))

    # ---- curve25519 / protocols ----
    from eccoxide_tpu.protocol import x25519 as px
    from eccoxide_tpu.protocol import ed25519 as ped

    sbytes = jnp.asarray(rng.integers(0, 256, size=(32, B), dtype=np.int32))
    ubytes = jnp.asarray(rng.integers(0, 256, size=(32, B), dtype=np.int32))
    xf = jax.jit(px.x25519)
    emit("x25519", _bench(xf, (sbytes, ubytes)))

    ED = c255.EDWARDS
    G = ED.generator((B,))
    emit("ed_point_add", _bench(jax.jit(lambda P: ED.add(P, P)), (G,)))
    emit("ed_point_double", _bench(jax.jit(ED.double), (G,)))
    edtabs = ped.device_tables()
    mb = jax.jit(ped.scalar_mul_base)
    emit("ed_mul_base_comb", _bench(mb, (sbytes, edtabs)))

    from __graft_entry__ import _example_verify_batch

    pk, r, s, kw = _example_verify_batch(min(B, 4096))
    vargs = tuple(jnp.asarray(a) for a in (pk, r, s, kw)) + (edtabs,)
    vf = jax.jit(ped.verify_core)
    out = vf(*vargs)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        out = vf(*vargs)
    out.block_until_ready()
    secs = (time.perf_counter() - t0) / 3
    print(json.dumps({"metric": "ed25519_verify", "value":
                      round(min(B, 4096) / secs, 1), "unit": "ops/s",
                      "batch": min(B, 4096), "sec": round(secs, 5)}),
          flush=True)

    # ---- x448 ----
    from eccoxide_tpu.protocol import x448 as px4

    s4 = jnp.asarray(rng.integers(0, 256, size=(56, B), dtype=np.int32))
    u4 = jnp.asarray(rng.integers(0, 256, size=(56, B), dtype=np.int32))
    emit("x448", _bench(jax.jit(px4.x448), (s4, u4)))


if __name__ == "__main__":
    main()
