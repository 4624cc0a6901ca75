"""x-only Montgomery-curve ladder, batched.

TPU-native rewrite of the reference's cswap ladder
(/root/reference/src/curve/curve25519.rs:444-492 and curve448.rs:254-302):
a fixed-trip lax.fori_loop whose body is the RFC 7748 differential
add-and-double (4 mul + 2 square + 4 add/sub + 1 mul-by-a24), with the
conditional swap realized as a masked select over the whole batch
(constant-time by construction on SIMD hardware).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..field import Field


@dataclass(frozen=True, eq=False)
class MontgomeryCurveSpec:
    """Curve B*y^2 = x^3 + A*x^2 + x (reference montgomery.rs:6-18)."""

    name: str
    field: Field
    A: int
    B: int
    base_u: int
    n_bits: int  # scalar bit length processed by the ladder

    @property
    def a24(self) -> int:
        return (self.A + 2) // 4


def ladder(spec: MontgomeryCurveSpec, u, k_bits):
    """Montgomery ladder: u-coordinates (n, B) x scalar bits (nbits, B)
    (bit i = coefficient of 2^i) -> u-coordinate of [k]P.

    Returns the affine u (x2 * z2^-1, with 0 for the zero-Z case, matching
    the reference's invert_or_zero, curve25519.rs:486-491).
    """
    f = spec.field
    batch = u.shape[1:]
    one = f.one(batch)
    zero = f.zero(batch)

    # (x1) = u; (x2, z2) = (1, 0); (x3, z3) = (u, 1)
    def body(i, st):
        x2, z2, x3, z3, swap = st
        bit_idx = spec.n_bits - 1 - i
        kt = jax.lax.dynamic_index_in_dim(k_bits, bit_idx, 0, keepdims=False)
        swap_now = swap ^ kt
        m = swap_now != 0
        x2, x3 = f.select(m, x3, x2), f.select(m, x2, x3)
        z2, z3 = f.select(m, z3, z2), f.select(m, z2, z3)
        swap = kt

        # differential add-and-double in b-land (field.py): pure SSA limb
        # arithmetic, one restack per state variable per iteration
        x2b, z2b = f.b_loose(x2), f.b_loose(z2)
        x3b, z3b = f.b_loose(x3), f.b_loose(z3)
        ub = f.b_loose(u)
        a = f.b_add(x2b, z2b)
        aa = f.b_sq(a)
        bq = f.b_sub(x2b, z2b)
        bb = f.b_sq(bq)
        e = f.b_carry(f.b_sub(aa, bb))
        c = f.b_add(x3b, z3b)
        d = f.b_sub(x3b, z3b)
        da = f.b_mul(d, a)
        cb = f.b_mul(c, bq)
        x3b = f.b_sq(f.b_add(da, cb))
        z3b = f.b_mul(ub, f.b_sq(f.b_sub(da, cb)))
        x2b = f.b_mul(aa, bb)
        # a24 = (A+2)/4 convention: z2 = E * (BB + a24*E); a24 is small, so
        # the a24*E product is a constant scaling, not a full field mul
        z2b = f.b_mul(e, f.b_add(bb, f.b_mul_small(e, spec.a24)))
        st = tuple(jnp.stack(v.vals) for v in (x2b, z2b, x3b, z3b))
        return st + (swap,)

    # constant-valued carries are tied to the varying inputs (`+ u*0`)
    # so the loop is well-typed under shard_map
    one_v = one + u * 0
    zero_v = zero + u * 0
    swap0 = jnp.zeros(batch, dtype=jnp.int32) + k_bits[0] * 0
    x2, z2, x3, z3, swap = jax.lax.fori_loop(
        0, spec.n_bits, body, (one_v, zero_v, u, one_v, swap0)
    )
    m = swap != 0
    x2 = f.select(m, x3, x2)
    z2 = f.select(m, z3, z2)
    return f.mul(x2, f.inverse(z2))
