"""ristretto255 batched implementation vs RFC 9496 vectors and the oracle.

Mirrors the reference's ristretto tests (/root/reference/src/curve/
curve25519/ristretto255.rs:283-420): base multiples, must-reject encodings,
one-way map, round-trips, group laws, representative-independent equality.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp

from eccoxide_tpu.curves import ristretto255 as rz
from eccoxide_tpu.oracle import ristretto as orc

_jits = {}


def J(name, fn):
    if name not in _jits:
        _jits[name] = jax.jit(fn)
    return _jits[name]


def cols(bs):
    return jnp.asarray(
        np.stack([np.frombuffer(b, np.uint8) for b in bs], axis=1).astype(np.int32)
    )


def rows(arr):
    a = np.asarray(arr)
    return [bytes(int(a[i, j]) & 0xFF for i in range(a.shape[0]))
            for j in range(a.shape[1])]


# RFC 9496 A.1: first three base multiples (also validated in the oracle
# self-test); beyond that the oracle is the source of truth.
B1 = bytes.fromhex("e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76")
B2 = bytes.fromhex("6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919")


def _windows(ks, nw=64):
    out = np.zeros((nw, len(ks)), dtype=np.int32)
    for j, k in enumerate(ks):
        for i in range(nw):
            out[i, j] = (k >> (4 * (nw - 1 - i))) & 0xF
    return jnp.asarray(out)


def test_base_multiples():
    ks = list(range(16))
    fn = J("mulbase", lambda w: rz.compress(
        rz.scalar_mul(rz.generator((w.shape[1],)), w)))
    got = rows(fn(_windows(ks)))
    for k, g in zip(ks, got):
        assert g == orc.compress(orc.mul(k)), f"k={k}"
    assert got[1] == B1 and got[2] == B2


def test_decompress_roundtrip_and_reject():
    rng = random.Random(5)
    good = [orc.compress(orc.mul(rng.randrange(1, 2**200))) for _ in range(6)]
    # must-reject: non-canonical s (p-1 is "negative"), s >= p, odd s
    bad = [
        (orc.P - 1).to_bytes(32, "little"),
        (orc.P + 3).to_bytes(32, "little"),
        (5).to_bytes(32, "little") if orc._is_neg(5) else (7).to_bytes(32, "little"),
    ]
    allb = good + bad
    fn = J("dec", rz.decompress)
    pt, ok = fn(cols(allb))
    okh = np.asarray(ok).tolist()
    assert okh[: len(good)] == [True] * len(good)
    assert okh[len(good):] == [False] * len(bad)
    # re-compress the good ones
    fn2 = J("comp", rz.compress)
    sub = jax.tree.map(lambda a: a[..., : len(good)], pt)
    got = rows(fn2(sub))
    assert got == good


def test_one_way_map_matches_oracle():
    rng = random.Random(6)
    ins = [bytes(rng.randrange(256) for _ in range(64)) for _ in range(6)]
    fn = J("map", lambda by: rz.compress(rz.from_uniform_bytes(by)))
    got = rows(fn(cols(ins)))
    for b, g in zip(ins, got):
        assert g == orc.compress(orc.from_uniform_bytes(b))


def test_group_law_and_eq():
    rng = random.Random(7)
    ks = [rng.randrange(1, 2**250) for _ in range(4)]
    js = [rng.randrange(1, 2**250) for _ in range(4)]
    sums = [(k + j) for k, j in zip(ks, js)]

    def law(wk, wj, ws):
        B = wk.shape[1]
        G = rz.generator((B,))
        Pk = rz.scalar_mul(G, wk)
        Pj = rz.scalar_mul(G, wj)
        Ps = rz.scalar_mul(G, ws)
        return rz.eq(rz.add(Pk, Pj), Ps)

    ok = J("law", law)(_windows(ks), _windows(js), _windows(sums, nw=65))
    assert bool(np.all(np.asarray(ok)))


# ---------------------------------------------------------------------------
# Full RFC 9496 appendix literals (kats_rfc9496.py; reference
# ristretto255.rs:283-341,343-386)
# ---------------------------------------------------------------------------

from kats_rfc9496 import A1_MULTIPLES, A2_BAD, A3_UNIFORM


def test_rfc9496_a1_all_16_multiples():
    ks = list(range(16))
    fn = J("mulbase", lambda w: rz.compress(
        rz.scalar_mul(rz.generator((w.shape[1],)), w)))
    got = rows(fn(_windows(ks)))
    assert got == [bytes.fromhex(h) for h in A1_MULTIPLES]


def test_rfc9496_a1_roundtrip():
    """All 16 A.1 encodings decompress (ok) and re-compress identically."""
    enc = [bytes.fromhex(h) for h in A1_MULTIPLES]
    pt, ok = J("dec", rz.decompress)(cols(enc))
    assert np.asarray(ok).all()
    assert rows(J("comp", rz.compress)(pt)) == enc


def test_rfc9496_a2_all_17_rejected():
    bad = [bytes.fromhex(h) for h in A2_BAD]
    _, ok = J("dec", rz.decompress)(cols(bad))
    assert not np.asarray(ok).any(), np.asarray(ok).tolist()


def test_rfc9496_a3_one_way_map_literals():
    ins = [bytes.fromhex(i) for i, _ in A3_UNIFORM]
    outs = [bytes.fromhex(o) for _, o in A3_UNIFORM]
    fn = J("map", lambda by: rz.compress(rz.from_uniform_bytes(by)))
    assert rows(fn(cols(ins))) == outs
