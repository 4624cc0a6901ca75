"""SEC2 prime-curve instantiations.

TPU-native counterpart of /root/reference/src/curve/sec2/*.rs (the 8
fiat-backed curves) plus the seven <192-bit curves the reference only
supports through its non-constant-time num-bigint backend
(/root/reference/src/curve/bigint/, README.md:36-39) — here every curve
runs on the same constant-time batched engines.

Field-engine roster: the reference backs these primes with word-serial
Montgomery (src/curve/fiat/mod.rs) — a 64-bit-CPU choice. On TPU every
coordinate field runs the solinas engine instead: the SEC2 primes are all
special-form, so high limbs fold with sparse constants (Koblitz/Crandall
primes, p521) or a one-shot matrix fold (p256r1's dense F — see
field.Field._fold_wide_matrix), avoiding the Montgomery scan's length-n
dependency chain. Scalar fields (random group orders, F ~ 2^bn: no fold
convergence) stay Montgomery.
"""

from __future__ import annotations

from ..field import Field
from ..params.sec2_params import CURVES
from .weierstrass import WeierstrassCurveSpec

_cache: dict = {}

# the curves the reference backs with fiat (src/curve/sec2/mod.rs:3-40)
FIAT_TIER = [
    "p192k1", "p192r1", "p224k1", "p224r1",
    "p256k1", "p256r1", "p384r1", "p521r1",
]
# the reference's `sec2-small` bigint tier (src/curve/sec2/bigint.rs:14-27)
SMALL_TIER = [
    "p112r1", "p112r2", "p128r1", "p128r2",
    "p160k1", "p160r1", "p160r2",
]
ALL = FIAT_TIER + SMALL_TIER


def get_curve(name: str) -> WeierstrassCurveSpec:
    if name in _cache:
        return _cache[name]
    c = CURVES[name]
    p = c["p"]
    a = c["a"] % p
    if a == 0:
        shape = "a0"
    elif a == p - 3:
        shape = "am3"
    else:
        shape = "generic"
    field_kind = "solinas" if Field.solinas_ok(p) else "mont"
    spec = WeierstrassCurveSpec(
        name=name,
        field=Field(name, p, field_kind),
        scalar=Field(name + "_scalar", c["order"], "mont"),
        a=c["a"],
        b_coeff=c["b"],
        gx=c["gx"],
        gy=c["gy"],
        shape=shape,
    )
    _cache[name] = spec
    return spec


def __getattr__(name: str):
    if name in ALL:
        return get_curve(name)
    raise AttributeError(name)
