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
