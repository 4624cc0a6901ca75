"""External NIST KATs (point-at-infinity.org/ecc/nisttv) through the
public API: [k]G must hit the published (x, y) for all 52 vectors per
prime curve — the same corpus and consumption pattern as the reference
(src/tests/kats_data.rs:7-15 data, src/tests/kats.rs:3-41 consumption).

All 52 vectors of a curve go through ONE batched comb mul_base call
(B=52), plus a spot-check of the CT variable-base path on a subset.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eccoxide_tpu.curves import sec2

from kats_nist import KATS

FAST = ["p192r1", "p256r1"]
SLOW = ["p224r1", "p384r1", "p521r1"]
PARAMS = [pytest.param(c, id=c) for c in FAST] + [
    pytest.param(c, id=c, marks=pytest.mark.slow) for c in SLOW
]

_jit_cache = {}


def _scalar_bytes_le(spec, ks):
    nb = spec.scalar.n_bytes
    out = np.zeros((nb, len(ks)), dtype=np.int32)
    for j, k in enumerate(ks):
        for i, byte in enumerate(k.to_bytes(nb, "little")):
            out[i, j] = byte
    return jnp.asarray(out)


def _windows(spec, ks):
    nbits = spec.scalar.bits
    nw = -(-nbits // 4)
    out = np.zeros((nw, len(ks)), dtype=np.int32)
    for j, k in enumerate(ks):
        for i in range(nw):
            out[i, j] = (k >> (4 * (nw - 1 - i))) & 0xF
    return jnp.asarray(out)


@pytest.mark.parametrize("name", PARAMS)
def test_nist_kats_mul_base(name):
    curve = sec2.get_curve(name)
    vecs = KATS[name]
    ks = [int(k, 16) for k, _, _ in vecs]
    key = (name, "kat_mbase")
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(curve.mul_base)
    R = _jit_cache[key](_scalar_bytes_le(curve, ks))
    ax, ay = curve.to_affine(R)
    xs = curve.field.decode_ints(ax)
    ys = curve.field.decode_ints(ay)
    for (khex, xhex, yhex), x, y in zip(vecs, xs, ys):
        assert x == int(xhex, 16), f"{name} k={khex}: x mismatch"
        assert y == int(yhex, 16), f"{name} k={khex}: y mismatch"


@pytest.mark.parametrize("name", PARAMS)
def test_nist_kats_ct_scalar_mul(name):
    """Subset of the vectors through the CT fixed-window variable-base
    path (the comb and CT paths must agree with the external data —
    two-independent-paths discipline, completeness.rs:59-117)."""
    curve = sec2.get_curve(name)
    vecs = KATS[name][:6] + KATS[name][-2:]
    ks = [int(k, 16) for k, _, _ in vecs]
    key = (name, "kat_ctmul")
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(
            lambda w: curve.scalar_mul(curve.generator((w.shape[1],)), w)
        )
    R = _jit_cache[key](_windows(curve, ks))
    ax, ay = curve.to_affine(R)
    xs = curve.field.decode_ints(ax)
    ys = curve.field.decode_ints(ay)
    for (khex, xhex, yhex), x, y in zip(vecs, xs, ys):
        assert x == int(xhex, 16), f"{name} k={khex}: x mismatch (CT path)"
        assert y == int(yhex, 16), f"{name} k={khex}: y mismatch (CT path)"


# ---------------------------------------------------------------------------
# Sage-generated p256k1 KATs (reference src/tests/sage.rs:9-1368; data in
# kats_sage_p256k1.py). p256k1 is not covered by the NIST corpus, so this
# is its external oracle: generator, add-same, add-different, and [n]G for
# n = 1..100 through the batched public API.
# ---------------------------------------------------------------------------

from kats_sage_p256k1 import SAGE_P256K1


def _affine_ints(curve, R):
    ax, ay = curve.to_affine(R)
    return curve.field.decode_ints(ax), curve.field.decode_ints(ay)


def test_sage_p256k1_generator_and_adds():
    curve = sec2.get_curve("p256k1")
    n1, x1, y1 = SAGE_P256K1[0]
    n2, x2, y2 = SAGE_P256K1[1]
    n3, x3, y3 = SAGE_P256K1[2]
    assert (n1, n2, n3) == (1, 2, 3)

    def graph():
        G = curve.generator((1,))
        G2 = curve.add(G, G)  # add_same via complete formulas
        P2 = curve.from_affine(
            curve.field.encode_ints([int(x2, 16)]),
            curve.field.encode_ints([int(y2, 16)]),
        )
        G3 = curve.add(G, P2)  # add_different
        return G, G2, G3

    key = "sage_adds"
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(graph)
    G, G2, G3 = _jit_cache[key]()
    for R, xh, yh in ((G, x1, y1), (G2, x2, y2), (G3, x3, y3)):
        xs, ys = _affine_ints(curve, R)
        assert xs[0] == int(xh, 16) and ys[0] == int(yh, 16)


@pytest.mark.slow
def test_sage_p256k1_mul_all_100():
    curve = sec2.get_curve("p256k1")
    ks = [n for n, _, _ in SAGE_P256K1]
    key = "sage_mul"
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(curve.mul_base)
    R = _jit_cache[key](_scalar_bytes_le(curve, ks))
    xs, ys = _affine_ints(curve, R)
    for (n, xh, yh), x, y in zip(SAGE_P256K1, xs, ys):
        assert x == int(xh, 16), f"n={n}: x mismatch"
        assert y == int(yh, 16), f"n={n}: y mismatch"
