"""Curve25519: field Fp(2^255-19), scalar field F(l), x-only Montgomery
ladder, and (in edwards.py-driven form) the edwards25519 group.

TPU-native counterpart of /root/reference/src/curve/curve25519.rs: one
solinas field engine instance replaces the fiat tight/loose-domain wrappers
(curve25519.rs:62-117); the ladder is in curves/montgomery.py; the Edwards
group instantiation lives in curves/edwards.py + this module's constants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import Field
from .montgomery import MontgomeryCurveSpec, ladder
from .edwards import EdwardsCurveSpec

P = 2**255 - 19
# group order l = 2^252 + 27742317777372353535851937790883648493
# (reference curve25519.rs:280-287)
L = 2**252 + 27742317777372353535851937790883648493

FQ = Field("curve25519", P, "solinas")
FL = Field("curve25519_scalar", L, "mont")

# Montgomery form: y^2 = x^3 + 486662 x^2 + x, base u = 9
# (reference curve25519.rs:344-371)
MONT = MontgomeryCurveSpec(
    name="curve25519", field=FQ, A=486662, B=1, base_u=9, n_bits=255
)

# Edwards form: -x^2 + y^2 = 1 + d x^2 y^2,
# d = -121665/121666, base point (x, 4/5) with x "positive"
# (reference curve25519.rs:373-427)
D = (-121665 * pow(121666, -1, P)) % P
ED_GY = (4 * pow(5, -1, P)) % P
# solve for gx: x^2 = (y^2-1)/(d y^2 + 1)
_t = (ED_GY * ED_GY - 1) * pow(D * ED_GY * ED_GY + 1, -1, P) % P
_gx = pow(_t, (P + 3) // 8, P)
if (_gx * _gx - _t) % P != 0:
    _gx = _gx * pow(2, (P - 1) // 4, P) % P
if _gx % 2 == 1:  # take the even ("positive") root: sign convention of
    _gx = P - _gx  # the reference (curve25519.rs:231-247 is_negative_ct)
ED_GX = _gx

EDWARDS = EdwardsCurveSpec(
    name="edwards25519",
    field=FQ,
    scalar=FL,
    a=-1,
    d=D,
    gx=ED_GX,
    gy=ED_GY,
    cofactor=8,
)

# birational map constant c = sqrt(-(A+2)) used by to_edwards/to_montgomery
# (reference curve25519.rs:407-427: c = sqrt(-486664))
_c = pow((-486664) % P, (P + 3) // 8, P)
if (_c * _c - (-486664) % P) % P != 0:
    _c = _c * pow(2, (P - 1) // 4, P) % P
if _c % 2 == 1:
    _c = P - _c
MAP_C = _c

SQRT_M1 = pow(2, (P - 1) // 4, P)  # sqrt(-1) (reference curve25519.rs:142-153)


def decode_u(by):
    """RFC 7748 u-coordinate decode: mask bit 255, no canonical check
    (reference x25519.rs:24-29). by: (32, B) int32 LE bytes."""
    by = by.at[31].set(by[31] & 0x7F)
    from ..limbs import bytes_le_to_limbs

    v = bytes_le_to_limbs(by, FQ.n, FQ.b)
    return FQ.reduce_wide(v)


def x25519_ladder(u_limbs, k_bits):
    return ladder(MONT, u_limbs, k_bits)
