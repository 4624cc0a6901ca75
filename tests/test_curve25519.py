"""curve25519 module tests: Edwards group laws, comb agreement, and the
ladder-vs-Edwards birational cross-check.

Mirrors the reference's in-module suite (/root/reference/src/curve/
curve25519.rs:937-1076): generator on curve, identity/negation,
double==add, order annihilation, comb==scale, linearity, compress
round-trip, ladder vs Edwards through the birational map, generator->(9,v).
"""

import random

import numpy as np
import jax
import jax.numpy as jnp

from eccoxide_tpu.curves import curve25519 as c255
from eccoxide_tpu.curves.montgomery import ladder

ED = c255.EDWARDS
FQ = c255.FQ
P = c255.P
L = c255.L

_jits = {}


def J(name, fn):
    if name not in _jits:
        _jits[name] = jax.jit(fn)
    return _jits[name]


def _windows(ks, nw=64):
    out = np.zeros((nw, len(ks)), dtype=np.int32)
    for j, k in enumerate(ks):
        for i in range(nw):
            out[i, j] = (k >> (4 * (nw - 1 - i))) & 0xF
    return jnp.asarray(out)


def test_generator_on_curve():
    ok = J("oncurve", lambda: ED.on_curve(ED.generator((1,))))()
    assert bool(np.asarray(ok).all())


def test_identity_neg_double():
    def f():
        G = ED.generator((2,))
        i1 = ED.add(G, ED.identity((2,)))
        e1 = ED.eq(i1, G)
        z = ED.add(G, ED.neg(G))
        e2 = ED.eq(z, ED.identity((2,)))
        e3 = ED.eq(ED.double(G), ED.add(G, G))
        return e1, e2, e3

    e1, e2, e3 = J("idneg", f)()
    assert bool(np.asarray(e1).all()) and bool(np.asarray(e2).all())
    assert bool(np.asarray(e3).all())


def test_order_annihilation():
    """[l]G == identity (reference curve25519.rs:961-965)."""
    ok = J(
        "ann",
        lambda w: ED.eq(
            ED.scalar_mul(ED.generator((w.shape[1],)), w),
            ED.identity((w.shape[1],)),
        ),
    )(_windows([L]))
    assert bool(np.asarray(ok).all())


def test_linearity_and_comb():
    rng = random.Random(31)
    ks = [rng.randrange(1, L) for _ in range(3)]
    js = [rng.randrange(1, L) for _ in range(3)]
    ss = [(k + j) % L for k, j in zip(ks, js)]

    def f(wk, wj, wsum):
        B = wk.shape[1]
        G = ED.generator((B,))
        lin = ED.eq(
            ED.add(ED.scalar_mul(G, wk), ED.scalar_mul(G, wj)),
            ED.scalar_mul(G, wsum),
        )
        return lin

    ok = J("lin", f)(_windows(ks), _windows(js), _windows(ss))
    assert bool(np.asarray(ok).all())


def test_comb_matches_scalar_mul():
    """Comb fixed-base equals generic CT mul (curve25519.rs:967-981)."""
    from eccoxide_tpu.params.comb import get_comb

    rng = random.Random(32)
    ks = [1, 2, L - 1] + [rng.randrange(1, L) for _ in range(3)]
    comb = get_comb("edwards25519")
    sb = np.zeros((32, len(ks)), dtype=np.int32)
    for j, k in enumerate(ks):
        for i, by in enumerate(k.to_bytes(32, "little")):
            sb[i, j] = by

    def f(sbytes, w):
        a = comb.mul_base(sbytes)
        b = ED.scalar_mul(ED.generator((sbytes.shape[1],)), w)
        return ED.eq(a, b)

    ok = J("comb", f)(jnp.asarray(sb), _windows(ks))
    assert bool(np.asarray(ok).all())


def test_compress_roundtrip():
    rng = random.Random(33)
    ks = [rng.randrange(1, L) for _ in range(4)]

    def f(w):
        Pt = ED.scalar_mul(ED.generator((w.shape[1],)), w)
        by = ED.compress(Pt)
        Q, ok = ED.decompress(by)
        return ED.eq(Pt, Q), ok

    same, ok = J("compress", f)(_windows(ks))
    assert bool(np.asarray(same).all()) and bool(np.asarray(ok).all())


def test_ladder_vs_edwards():
    """x-only ladder agrees with Edwards scalar mul through the birational
    map u = (1+y)/(1-y) (reference curve25519.rs:1035-1046)."""
    rng = random.Random(34)
    ks = [rng.randrange(1, 2**255) for _ in range(3)]
    k_bits = np.zeros((255, len(ks)), dtype=np.int32)
    for j, k in enumerate(ks):
        for i in range(255):
            k_bits[i, j] = (k >> i) & 1

    def f(w, kb):
        B = w.shape[1]
        G = ED.generator((B,))
        Pt = ED.scalar_mul(G, w)
        ax, ay = ED.to_affine(Pt)
        one = FQ.one((B,))
        u_ed = FQ.mul(FQ.add(one, ay), FQ.inverse(FQ.sub(one, ay)))
        u9 = FQ.bcast(FQ.const(9), (B,))
        u_lad = ladder(c255.MONT, u9, kb)
        return FQ.eq(u_ed, u_lad)

    ok = J("ladvse", f)(_windows(ks), jnp.asarray(k_bits))
    assert bool(np.asarray(ok).all())


def test_generator_maps_to_9():
    """Edwards G maps to Montgomery u=9 (curve25519.rs:1048-1057)."""
    def f():
        G = ED.generator((1,))
        ax, ay = ED.to_affine(G)
        one = FQ.one((1,))
        u = FQ.mul(FQ.add(one, ay), FQ.inverse(FQ.sub(one, ay)))
        return FQ.eq(u, FQ.bcast(FQ.const(9), (1,)))

    assert bool(np.asarray(J("gmap", f)()).all())


def test_skipped_t_consumption_fails_loudly():
    """need_t=False leaves a poisoned T (edwards._SkippedT): consuming it
    in any addition must fail at TRACE time, not silently compute with a
    garbage T=0 (round-3 VERDICT weak #8)."""
    import pytest

    g = ED.generator((2,))
    gb = ED._unstack(g)
    d = ED.double_b(gb, need_t=False)
    with pytest.raises(AssertionError, match="need_t"):
        ED.add_b(d, gb)
    with pytest.raises(AssertionError, match="need_t"):
        ED.add_b(gb, d)
    with pytest.raises(AssertionError, match="need_t"):
        ED.add_mixed_b(d, gb.x, gb.y, gb.t)
    # the sanctioned chain still works: finish with a need_t=True double
    ok = ED.double_b(d, need_t=True)
    out = ED._stack(ED.add_b(ok, gb))
    assert out.x.shape[0] == FQ.n
