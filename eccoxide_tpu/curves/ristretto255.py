"""ristretto255: the RFC 9496 prime-order group over edwards25519, batched.

TPU-native counterpart of /root/reference/src/curve/curve25519/
ristretto255.rs: compress (:73-98), decompress with canonicality rejection
(:105-135), representative-independent equality (:138-146), the Elligator 2
one-way map (:186-213) and from_uniform_bytes (:170-183). Group operations
delegate to the extended-Edwards machinery (:149-161), exactly like the
reference. All early-exit rejections become validity-mask plumbing over the
batch (SURVEY.md §7.2 hard part 3).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import curve25519 as c255
from .edwards import ExtPoint

FQ = c255.FQ
ED = c255.EDWARDS
P = c255.P

SQRT_M1 = c255.SQRT_M1
# constants per RFC 9496 §4 (reference ristretto255.rs:31-52)
D = c255.D
SQRT_AD_MINUS_ONE = None  # computed below
INVSQRT_A_MINUS_D = None
ONE_MINUS_D_SQ = (1 - D * D) % P
D_MINUS_ONE_SQ = ((D - 1) * (D - 1)) % P


def _even_sqrt(x):
    """Square root with the ristretto non-negative (even) convention."""
    x %= P
    r = pow(x, (P + 3) // 8, P)
    if (r * r - x) % P != 0:
        r = r * SQRT_M1 % P
    assert (r * r - x) % P == 0, "not a square"
    return r if r % 2 == 0 else P - r


# RFC 9496 fixes SQRT_AD_MINUS_ONE to the ODD root (verified against the
# A.3 one-way-map literals; the even root maps to the wrong point).
SQRT_AD_MINUS_ONE = P - _even_sqrt(-1 - D)  # sqrt(a*d - 1), a = -1
INVSQRT_A_MINUS_D = _even_sqrt(pow((-1 - D) % P, -1, P))


def sqrt_ratio_m1(u, v):
    """(was_square, sqrt(u/v) or sqrt(i*u/v)) — constant-time, RFC 9496
    §4.2 (reference curve25519.rs:252-266)."""
    f = FQ
    batch = u.shape[1:]
    v3 = f.mul(f.square(v), v)
    v7 = f.mul(f.square(v3), v)
    r = f.mul(f.mul(u, v3), f.pow_const(f.mul(u, v7), (P - 5) // 8))
    check = f.mul(v, f.square(r))
    i = f.bcast(f.const(SQRT_M1), batch)
    correct = f.eq(check, u)
    flipped = f.eq(check, f.neg(u))
    flipped_i = f.eq(check, f.neg(f.mul(u, i)))
    r_prime = f.mul(r, i)
    r = f.select(jnp.logical_or(flipped, flipped_i), r_prime, r)
    # choose the non-negative (even) root
    r = f.select(f.sgn0(r) == 1, f.neg(r), r)
    was_square = jnp.logical_or(correct, flipped)
    return was_square, r


def compress(pt: ExtPoint):
    """RFC 9496 §4.3.2 encoding -> (32, B) bytes (reference
    ristretto255.rs:73-98)."""
    f = FQ
    batch = pt.x.shape[1:]
    x, y, z, t = pt
    u1 = f.mul(f.add(z, y), f.sub(z, y))
    u2 = f.mul(x, y)
    _, invsqrt = sqrt_ratio_m1(f.one(batch), f.mul(u1, f.square(u2)))
    den1 = f.mul(invsqrt, u1)
    den2 = f.mul(invsqrt, u2)
    z_inv = f.mul(f.mul(den1, den2), t)
    i = f.bcast(f.const(SQRT_M1), batch)
    ix = f.mul(x, i)
    iy = f.mul(y, i)
    enchanted = f.bcast(f.const(INVSQRT_A_MINUS_D), batch)
    enchanted_denominator = f.mul(den1, enchanted)
    rotate = f.sgn0(f.mul(t, z_inv)) == 1
    x_ = f.select(rotate, iy, x)
    y_ = f.select(rotate, ix, y)
    den_inv = f.select(rotate, enchanted_denominator, den2)
    y_ = f.select(f.sgn0(f.mul(x_, z_inv)) == 1, f.neg(y_), y_)
    s = f.mul(den_inv, f.sub(z, y_))
    s = f.select(f.sgn0(s) == 1, f.neg(s), s)
    return f.to_bytes_le(s)


def decompress(by):
    """RFC 9496 §4.3.1 decoding -> (ExtPoint, valid mask) (reference
    ristretto255.rs:105-135)."""
    f = FQ
    s, canonical = f.from_bytes_le(by)
    batch = s.shape[1:]
    one = f.one(batch)
    valid = jnp.logical_and(canonical, f.sgn0(s) == 0)
    ss = f.square(s)
    u1 = f.sub(one, ss)
    u2 = f.add(one, ss)
    u2_sqr = f.square(u2)
    d = f.bcast(f.const(D), batch)
    v = f.sub(f.neg(f.mul(d, f.square(u1))), u2_sqr)
    was_square, invsqrt = sqrt_ratio_m1(one, f.mul(v, u2_sqr))
    den_x = f.mul(invsqrt, u2)
    den_y = f.mul(f.mul(invsqrt, den_x), v)
    x = f.mul(f.add(s, s), den_x)
    x = f.select(f.sgn0(x) == 1, f.neg(x), x)
    y = f.mul(u1, den_y)
    t = f.mul(x, y)
    valid = jnp.logical_and(valid, was_square)
    valid = jnp.logical_and(valid, f.sgn0(t) == 0)
    valid = jnp.logical_and(valid, jnp.logical_not(f.is_zero(y)))
    return ExtPoint(x, y, one, t), valid


def eq(p: ExtPoint, q: ExtPoint):
    """Representative-independent equality: x1*y2 == y1*x2 or
    y1*y2 == -a*x1*x2 (reference ristretto255.rs:138-146)."""
    f = FQ
    a = f.eq(f.mul(p.x, q.y), f.mul(p.y, q.x))
    b = f.eq(f.mul(p.y, q.y), f.mul(p.x, q.x))
    return jnp.logical_or(a, b)


def elligator(r0):
    """RFC 9496 §4.3.4 MAP: field element -> point (reference
    ristretto255.rs:186-213)."""
    f = FQ
    batch = r0.shape[1:]
    one = f.one(batch)
    i = f.bcast(f.const(SQRT_M1), batch)
    d = f.bcast(f.const(D), batch)
    r = f.mul(i, f.square(r0))
    n_s = f.mul(f.add(r, one), f.bcast(f.const(ONE_MINUS_D_SQ), batch))
    c = f.neg(one)
    d_ = f.mul(f.sub(c, f.mul(d, r)), f.add(r, d))
    was_square, s = sqrt_ratio_m1(n_s, d_)
    s_prime = f.mul(s, r0)
    s_prime = f.select(f.sgn0(s_prime) == 0, f.neg(s_prime), s_prime)
    s = f.select(was_square, s, s_prime)
    c = f.select(was_square, c, r)
    n_t = f.sub(
        f.sub(f.mul(f.mul(c, f.sub(r, one)),
                    f.bcast(f.const(D_MINUS_ONE_SQ), batch)), d_),
        f.zero(batch),
    )
    w0 = f.mul(f.add(s, s), d_)
    w1 = f.mul(n_t, f.bcast(f.const(SQRT_AD_MINUS_ONE), batch))
    w2 = f.sub(one, f.square(s))
    w3 = f.add(one, f.square(s))
    return ExtPoint(
        f.mul(w0, w3), f.mul(w2, w1), f.mul(w1, w3), f.mul(w0, w2)
    )


def from_uniform_bytes(by):
    """64 uniform bytes -> group element: two Elligator maps + add
    (reference ristretto255.rs:170-183)."""
    f = FQ
    from ..limbs import bytes_le_to_limbs

    def fe(bs):
        bs = bs.at[31].set(bs[31] & 0x7F)  # mask high bit, then reduce
        return f.reduce_wide(bytes_le_to_limbs(bs, f.n, f.b))

    p1 = elligator(fe(by[:32]))
    p2 = elligator(fe(by[32:]))
    return ED.add(p1, p2)


# group ops delegate to the Edwards machinery (ristretto255.rs:149-161)
add = ED.add
double = ED.double
neg = ED.neg
identity = ED.identity
generator = ED.generator
scalar_mul = ED.scalar_mul


def mul_base(scalar_bytes):
    from ..protocol.ed25519 import scalar_mul_base

    return scalar_mul_base(scalar_bytes)
