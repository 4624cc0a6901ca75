"""Pippenger MSM: local and mesh-sharded, vs the Python oracle.

New subsystem (SURVEY.md §2c / BASELINE north star); correctness rests on
the complete addition formulas (reference projective.rs:953-966), which the
bucket/tree reductions here exercise with identities, duplicates, and
arbitrary orderings.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eccoxide_tpu.curves import sec2
from eccoxide_tpu.oracle.curve import WCurve
from eccoxide_tpu.params.sec2_params import CURVES
from eccoxide_tpu.parallel.msm import msm_local, make_sharded_msm


def _setup(name, B, seed=5):
    spec = sec2.get_curve(name)
    c = CURVES[name]
    o = WCurve(c["p"], c["a"] % c["p"], c["b"], c["gx"], c["gy"], c["order"])
    rng = random.Random(seed)
    ks = [rng.randrange(0, o.order) for _ in range(B)]
    pts_aff = [o.mul_base(rng.randrange(1, o.order)) for _ in range(B)]
    f = spec.field
    X = f.encode_ints([pt[0] for pt in pts_aff])
    Y = f.encode_ints([pt[1] for pt in pts_aff])
    pts = spec.from_affine(X, Y)
    nb = spec.scalar.n_bytes
    sc = np.zeros((nb, B), dtype=np.int32)
    for j, k in enumerate(ks):
        for i, by in enumerate(k.to_bytes(nb, "little")):
            sc[i, j] = by
    exp = None
    for k, pt in zip(ks, pts_aff):
        exp = o.add(exp, o.mul(k, pt))
    return spec, o, pts, jnp.asarray(sc), exp


def test_msm_local_p256r1():
    spec, o, pts, sc, exp = _setup("p256r1", 17)
    out = jax.jit(lambda p, s: msm_local(spec, p, s, c=4))(pts, sc)
    ax, ay = spec.to_affine(out)
    got = (spec.field.decode_ints(ax)[0], spec.field.decode_ints(ay)[0])
    assert got == exp


def test_msm_local_duplicates_and_zeros():
    """Duplicate points, zero scalars, and tiny batches stress the
    segmented reduction's edge cases."""
    spec = sec2.get_curve("p256r1")
    c = CURVES["p256r1"]
    o = WCurve(c["p"], c["a"] % c["p"], c["b"], c["gx"], c["gy"], c["order"])
    f = spec.field
    g = o.mul_base(1)
    B = 6
    pts_aff = [g] * B  # all identical points
    ks = [0, 1, 1, 2, 0, 5]
    X = f.encode_ints([p_[0] for p_ in pts_aff])
    Y = f.encode_ints([p_[1] for p_ in pts_aff])
    pts = spec.from_affine(X, Y)
    nb = spec.scalar.n_bytes
    sc = np.zeros((nb, B), dtype=np.int32)
    for j, k in enumerate(ks):
        sc[0, j] = k
    out = jax.jit(lambda p, s: msm_local(spec, p, s, c=4))(pts, jnp.asarray(sc))
    ax, ay = spec.to_affine(out)
    got = (f.decode_ints(ax)[0], f.decode_ints(ay)[0])
    assert got == o.mul_base(sum(ks))


def test_msm_sharded():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    spec, o, pts, sc, exp = _setup("p192k1", 16, seed=7)
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("dp",))
    msm = make_sharded_msm(spec, mesh, c=4, axis="dp")
    pts_sh = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(None, "dp"))), pts
    )
    sc_sh = jax.device_put(sc, NamedSharding(mesh, P(None, "dp")))
    out = msm(pts_sh, sc_sh)
    ax, ay = spec.to_affine(out)
    got = (spec.field.decode_ints(ax)[0], spec.field.decode_ints(ay)[0])
    assert got == exp
