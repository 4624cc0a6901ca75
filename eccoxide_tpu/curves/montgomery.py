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
    a24 = f.bcast(f.const(spec.a24), batch)

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

        a = f.add(x2, z2)
        aa = f.square(a)
        b_ = f.sub(x2, z2)
        bb = f.square(b_)
        e = f.sub(aa, bb)
        c = f.add(x3, z3)
        d = f.sub(x3, z3)
        da = f.mul(d, a)
        cb = f.mul(c, b_)
        t0 = f.add(da, cb)
        x3 = f.square(t0)
        t1 = f.sub(da, cb)
        z3 = f.mul(u, f.square(t1))
        x2 = f.mul(aa, bb)
        # a24 = (A+2)/4 convention: z2 = E * (BB + a24*E)
        z2 = f.mul(e, f.add(bb, f.mul(a24, e)))
        return (x2, z2, x3, z3, swap)

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
