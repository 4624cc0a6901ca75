"""Curve448: Fp(2^448 - 2^224 - 1) and the X448 Montgomery ladder.

TPU-native counterpart of /root/reference/src/curve/curve448.rs. Like the
reference, this module deliberately exposes no Edwards group and no scalar
field — only the x-only ladder needed by X448 (curve448.rs:14-18).
"""

from __future__ import annotations

from ..field import Field
from .montgomery import MontgomeryCurveSpec, ladder

P = 2**448 - 2**224 - 1

FQ = Field("curve448", P, "solinas")

# y^2 = x^3 + 156326 x^2 + x, base u = 5, A24 = 39082
# (reference curve448.rs:200-237)
MONT = MontgomeryCurveSpec(
    name="curve448", field=FQ, A=156326, B=1, base_u=5, n_bits=448
)
assert MONT.a24 == 39082


def decode_u(by):
    """RFC 7748 u decode for X448: all 56 bytes used, reduced mod p."""
    from ..limbs import bytes_le_to_limbs

    v = bytes_le_to_limbs(by, FQ.n, FQ.b)
    return FQ.reduce_wide(v)


def x448_ladder(u_limbs, k_bits):
    return ladder(MONT, u_limbs, k_bits)
