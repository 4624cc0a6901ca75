"""Short-Weierstrass groups in homogeneous projective coordinates, batched.

TPU-native counterpart of /root/reference/src/curve/projective.rs: the
complete Renes-Costello-Batina 2015 addition/doubling formulas in the same
three specializations the reference compiles (generic-a Algorithms 1/3,
projective.rs:186-266,485-530; a=0 Algorithms 7/9, projective.rs:268-338;
a=-3 Algorithms 4/6, projective.rs:340-423,585-645), plus constant-time
fixed-window scalar multiplication (projective.rs:784-888) and the comb
fixed-base path (projective.rs:898-951).

Because the formulas are complete, identity/equal/inverse inputs need no
branching — exactly what a SIMD batch wants (the reference makes the same
observation at src/tests/completeness.rs:1-13).

The wNAF vartime path of the reference (projective.rs:665-782) is
deliberately not carried over: per-element data-dependent window schedules
do not exist under SIMD batching, and the CT path must agree with it anyway
(completeness.rs:59-94).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..field import Field


class ProjPoint(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array


@dataclass(frozen=True, eq=False)
class WeierstrassCurveSpec:
    """y^2 = x^3 + a*x + b (reference weierstrass.rs:6-30; shape markers
    A0/AM3 become the ``shape`` tag here)."""

    name: str
    field: Field
    scalar: Field
    a: int
    b_coeff: int
    gx: int
    gy: int
    shape: str  # "generic" | "a0" | "am3"

    def __post_init__(self):
        p = self.field.p
        if self.shape == "a0":
            assert self.a % p == 0
        if self.shape == "am3":
            assert self.a % p == p - 3

    # -- constants ------------------------------------------------------

    def _c(self, v, batch):
        f = self.field
        return f.bcast(f.const(v), batch)

    def identity(self, batch=(1,)) -> ProjPoint:
        f = self.field
        return ProjPoint(f.zero(batch), f.one(batch), f.zero(batch))

    def generator(self, batch=(1,)) -> ProjPoint:
        f = self.field
        return ProjPoint(
            self._c(self.gx, batch), self._c(self.gy, batch), f.one(batch)
        )

    def from_affine(self, x, y) -> ProjPoint:
        return ProjPoint(x, y, self.field.one(x.shape[1:]))

    # -- complete group law --------------------------------------------

    def _unstack(self, P: ProjPoint) -> ProjPoint:
        f = self.field
        return ProjPoint(*(f.b_loose(c) for c in P))

    def _stack(self, P: ProjPoint) -> ProjPoint:
        f = self.field
        return ProjPoint(*(f.b_stack(c) for c in P))

    def add_b(self, P: ProjPoint, Q: ProjPoint) -> ProjPoint:
        """b-land complete addition (coords are field._B values)."""
        if self.shape == "a0":
            return self._add_a0(P, Q)
        if self.shape == "am3":
            return self._add_am3(P, Q)
        return self._add_generic(P, Q)

    def double_b(self, P: ProjPoint) -> ProjPoint:
        if self.shape == "a0":
            return self._dbl_a0(P)
        if self.shape == "am3":
            return self._dbl_am3(P)
        return self._dbl_generic(P)

    def add(self, P: ProjPoint, Q: ProjPoint) -> ProjPoint:
        return self._stack(self.add_b(self._unstack(P), self._unstack(Q)))

    def double(self, P: ProjPoint) -> ProjPoint:
        return self._stack(self.double_b(self._unstack(P)))

    def _add_generic(self, P, Q):
        """RCB15 Algorithm 1 (reference projective.rs:186-266)."""
        f = self.field.fused
        batch = P.x.vals[0].shape
        a = f.const_b(self.a % self.field.p, batch)
        b3 = f.const_b(3 * self.b_coeff % self.field.p, batch)
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        t0 = f.mul(X1, X2)
        t1 = f.mul(Y1, Y2)
        t2 = f.mul(Z1, Z2)
        t3 = f.mul(f.add(X1, Y1), f.add(X2, Y2))
        t3 = f.sub(t3, f.add(t0, t1))
        t4 = f.mul(f.add(X1, Z1), f.add(X2, Z2))
        t4 = f.sub(t4, f.add(t0, t2))
        t5 = f.mul(f.add(Y1, Z1), f.add(Y2, Z2))
        t5 = f.sub(t5, f.add(t1, t2))
        Z3 = f.mul(a, t4)
        X3 = f.mul(b3, t2)
        Z3 = f.add(X3, Z3)
        X3 = f.sub(t1, Z3)
        Z3 = f.add(t1, Z3)
        Y3 = f.mul(X3, Z3)
        t1 = f.add(f.double(t0), t0)
        t2 = f.mul(a, t2)
        t4b = f.mul(b3, t4)
        t1 = f.add(t1, t2)
        t2 = f.mul(a, f.sub(t0, t2))
        t4b = f.add(t4b, t2)
        Y3 = f.add(Y3, f.mul(t1, t4b))
        X3 = f.sub(f.mul(t3, X3), f.mul(t5, t4b))
        Z3 = f.add(f.mul(t5, Z3), f.mul(t3, t1))
        return ProjPoint(X3, Y3, Z3)

    def _dbl_generic(self, P):
        """RCB15 Algorithm 3 (reference projective.rs:485-530)."""
        f = self.field.fused
        batch = P.x.vals[0].shape
        a = f.const_b(self.a % self.field.p, batch)
        b3 = f.const_b(3 * self.b_coeff % self.field.p, batch)
        X, Y, Z = P
        t0 = f.square(X)
        t1 = f.square(Y)
        t2 = f.square(Z)
        t3 = f.double(f.mul(X, Y))
        Z3 = f.double(f.mul(X, Z))
        X3 = f.mul(a, Z3)
        Y3 = f.add(X3, f.mul(b3, t2))
        X3 = f.sub(t1, Y3)
        Y3 = f.add(t1, Y3)
        Y3 = f.mul(X3, Y3)
        X3 = f.mul(t3, X3)
        Z3 = f.mul(b3, Z3)
        t2a = f.mul(a, t2)
        t3b = f.add(f.mul(a, f.sub(t0, t2a)), Z3)
        Z3b = f.add(f.double(t0), t0)
        t0b = f.mul(f.add(Z3b, t2a), t3b)
        Y3 = f.add(Y3, t0b)
        t2b = f.double(f.mul(Y, Z))
        X3 = f.sub(X3, f.mul(t2b, t3b))
        Z3 = f.double(f.double(f.mul(t2b, t1)))
        return ProjPoint(X3, Y3, Z3)

    def _add_a0(self, P, Q):
        """RCB15 Algorithm 7 (reference projective.rs:268-338)."""
        f = self.field.fused
        batch = P.x.vals[0].shape
        b3 = f.const_b(3 * self.b_coeff % self.field.p, batch)
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        t0 = f.mul(X1, X2)
        t1 = f.mul(Y1, Y2)
        t2 = f.mul(Z1, Z2)
        t3 = f.mul(f.add(X1, Y1), f.add(X2, Y2))
        t3 = f.sub(t3, f.add(t0, t1))
        t4 = f.mul(f.add(Y1, Z1), f.add(Y2, Z2))
        t4 = f.sub(t4, f.add(t1, t2))
        Y3 = f.sub(
            f.mul(f.add(X1, Z1), f.add(X2, Z2)), f.add(t0, t2)
        )
        t0 = f.add(f.double(t0), t0)
        t2 = f.mul(b3, t2)
        Z3 = f.add(t1, t2)
        t1 = f.sub(t1, t2)
        Y3 = f.mul(b3, Y3)
        X3 = f.sub(f.mul(t3, t1), f.mul(t4, Y3))
        Y3 = f.add(f.mul(t1, Z3), f.mul(Y3, t0))
        Z3 = f.add(f.mul(Z3, t4), f.mul(t0, t3))
        return ProjPoint(X3, Y3, Z3)

    def _dbl_a0(self, P):
        """RCB15 Algorithm 9."""
        f = self.field.fused
        batch = P.x.vals[0].shape
        b3 = f.const_b(3 * self.b_coeff % self.field.p, batch)
        X, Y, Z = P
        t0 = f.square(Y)
        Z3 = f.double(f.double(f.double(t0)))
        t1 = f.mul(Y, Z)
        t2 = f.mul(b3, f.square(Z))
        X3 = f.mul(t2, Z3)
        Y3 = f.add(t0, t2)
        Z3 = f.mul(t1, Z3)
        t2b = f.add(f.double(t2), t2)
        t0 = f.sub(t0, t2b)
        Y3 = f.add(X3, f.mul(t0, Y3))
        X3 = f.double(f.mul(t0, f.mul(X, Y)))
        return ProjPoint(X3, Y3, Z3)

    def _add_am3(self, P, Q):
        """RCB15 Algorithm 4 (reference projective.rs:340-423)."""
        f = self.field.fused
        batch = P.x.vals[0].shape
        b = f.const_b(self.b_coeff % self.field.p, batch)
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        t0 = f.mul(X1, X2)
        t1 = f.mul(Y1, Y2)
        t2 = f.mul(Z1, Z2)
        t3 = f.mul(f.add(X1, Y1), f.add(X2, Y2))
        t3 = f.sub(t3, f.add(t0, t1))
        t4 = f.mul(f.add(Y1, Z1), f.add(Y2, Z2))
        t4 = f.sub(t4, f.add(t1, t2))
        Y3 = f.sub(
            f.mul(f.add(X1, Z1), f.add(X2, Z2)), f.add(t0, t2)
        )
        Z3 = f.mul(b, t2)
        X3 = f.sub(Y3, Z3)
        Z3b = f.double(X3)
        X3 = f.add(X3, Z3b)
        Z3 = f.sub(t1, X3)
        X3 = f.add(t1, X3)
        Y3 = f.mul(b, Y3)
        t1b = f.double(t2)
        t2b = f.add(t1b, t2)
        Y3 = f.sub(f.sub(Y3, t2b), t0)
        t1c = f.double(Y3)
        Y3 = f.add(t1c, Y3)
        t1d = f.double(t0)
        t0 = f.add(t1d, t0)
        t0 = f.sub(t0, t2b)
        t1e = f.mul(t4, Y3)
        t2c = f.mul(t0, Y3)
        Y3 = f.add(f.mul(X3, Z3), t2c)
        X3 = f.sub(f.mul(t3, X3), t1e)
        Z3 = f.add(f.mul(t4, Z3), f.mul(t3, t0))
        return ProjPoint(X3, Y3, Z3)

    def _dbl_am3(self, P):
        """RCB15 Algorithm 6 (reference projective.rs:585-645)."""
        f = self.field.fused
        batch = P.x.vals[0].shape
        b = f.const_b(self.b_coeff % self.field.p, batch)
        X, Y, Z = P
        t0 = f.square(X)
        t1 = f.square(Y)
        t2 = f.square(Z)
        t3 = f.double(f.mul(X, Y))
        Z3 = f.double(f.mul(X, Z))
        Y3 = f.sub(f.mul(b, t2), Z3)
        X3 = f.double(Y3)
        Y3 = f.add(X3, Y3)
        X3 = f.sub(t1, Y3)
        Y3 = f.add(t1, Y3)
        Y3 = f.mul(X3, Y3)
        X3 = f.mul(X3, t3)
        t3b = f.double(t2)
        t2b = f.add(t2, t3b)
        Z3 = f.mul(b, Z3)
        Z3 = f.sub(f.sub(Z3, t2b), t0)
        t3c = f.double(Z3)
        Z3 = f.add(Z3, t3c)
        t3d = f.double(t0)
        t0 = f.add(t3d, t0)
        t0 = f.sub(t0, t2b)
        Y3 = f.add(f.mul(t0, Z3), Y3)
        t0b = f.double(f.mul(Y, Z))
        Z3 = f.mul(t0b, Z3)
        X3 = f.sub(X3, Z3)
        Z3 = f.double(f.double(f.mul(t0b, t1)))
        return ProjPoint(X3, Y3, Z3)

    # -- point utilities ------------------------------------------------

    def neg(self, P: ProjPoint) -> ProjPoint:
        f = self.field
        return ProjPoint(P.x, f.neg(P.y), P.z)

    def select(self, mask, P: ProjPoint, Q: ProjPoint) -> ProjPoint:
        f = self.field
        return ProjPoint(
            f.select(mask, P.x, Q.x),
            f.select(mask, P.y, Q.y),
            f.select(mask, P.z, Q.z),
        )

    def eq(self, P: ProjPoint, Q: ProjPoint):
        """Projective equality via cross-multiplication (reference
        projective.rs:133-144)."""
        f = self.field
        ex = f.eq(f.mul(P.x, Q.z), f.mul(Q.x, P.z))
        ey = f.eq(f.mul(P.y, Q.z), f.mul(Q.y, P.z))
        # both at infinity compare equal through the cross-mul as well
        return jnp.logical_and(ex, ey)

    def is_identity(self, P: ProjPoint):
        return self.field.is_zero(P.z)

    def on_curve(self, P: ProjPoint):
        """y^2 z == x^3 + a x z^2 + b z^3 (projective curve equation)."""
        f = self.field
        batch = P.x.shape[1:]
        z2 = f.square(P.z)
        lhs = f.mul(f.square(P.y), P.z)
        rhs = f.add(
            f.mul(f.square(P.x), P.x),
            f.add(
                f.mul(self._c(self.a, batch), f.mul(P.x, z2)),
                f.mul(self._c(self.b_coeff, batch), f.mul(z2, P.z)),
            ),
        )
        return jnp.logical_or(f.eq(lhs, rhs), self.is_identity(P))

    def to_affine(self, P: ProjPoint):
        """(x, y) affine; (0, 0) for the identity (reference affine uses an
        Option; the batched form returns an is_identity mask separately)."""
        f = self.field
        zi = f.inverse(P.z)
        return f.mul(P.x, zi), f.mul(P.y, zi)

    # -- affine arithmetic (reference affine.rs:74-127) ----------------

    def from_coordinate(self, x, y):
        """(x, y) field elements -> (ProjPoint, on_curve_mask). The batched
        analogue of the reference's PointAffine::from_coordinate
        (affine.rs:74-87): the mask is False where y^2 != x^3 + ax + b."""
        f = self.field
        batch = x.shape[1:]
        rhs = f.add(
            f.mul(f.square(x), x),
            f.add(f.mul(self._c(self.a, batch), x), self._c(self.b_coeff, batch)),
        )
        ok = f.eq(f.square(y), rhs)
        return self.from_affine(x, y), ok

    def affine_double(self, x, y):
        """Affine doubling via field inversion: lambda = (3x^2 + a)/(2y)
        (reference affine.rs:89-99). Returns (x', y'); garbage where
        y == 0 (the reference returns the caller's contract violation)."""
        f = self.field
        batch = x.shape[1:]
        num = f.add(f.mul_small(f.square(x), 3), self._c(self.a, batch))
        lam = f.mul(num, f.inverse(f.double(y)))
        x3 = f.sub(f.square(lam), f.double(x))
        y3 = f.sub(f.mul(lam, f.sub(x, x3)), y)
        return x3, y3

    def affine_add_different(self, x1, y1, x2, y2):
        """Affine addition of distinct points: lambda = (y2-y1)/(x2-x1)
        (reference affine.rs:113-127). Garbage where x1 == x2."""
        f = self.field
        lam = f.mul(f.sub(y2, y1), f.inverse(f.sub(x2, x1)))
        x3 = f.sub(f.sub(f.square(lam), x1), x2)
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        return x3, y3

    # -- scalar multiplication -----------------------------------------

    def _window_table(self, P: ProjPoint, w: int = 4):
        """[0]P .. [2^w-1]P stacked along a leading axis (scan-built)."""

        def step(acc, _):
            return self.add(acc, P), acc

        ref = (P.x + P.y) * 0
        P0 = ProjPoint(P.x + ref, P.y + ref, P.z + ref)
        _, ys = jax.lax.scan(step, P0, None, length=2**w - 1)
        ident = self.identity(P.x.shape[1:])
        return ProjPoint(
            jnp.concatenate([ident.x[None], ys.x], axis=0),
            jnp.concatenate([ident.y[None], ys.y], axis=0),
            jnp.concatenate([ident.z[None], ys.z], axis=0),
        )

    def _ct_lookup(self, table: ProjPoint, idx):
        """Full-scan constant-time select (reference projective.rs:427-434)."""
        size = table.x.shape[0]
        sel = jnp.arange(size, dtype=jnp.int32)[:, None] == idx[None, :]

        def pick(coord):
            return jnp.sum(
                jnp.where(sel[:, None, :], coord, 0), axis=0, dtype=jnp.int32
            )

        return ProjPoint(pick(table.x), pick(table.y), pick(table.z))

    def scalar_mul(self, P: ProjPoint, windows, w: int = 4) -> ProjPoint:
        """Constant-time fixed-window scalar mul (reference
        projective.rs:784-888 scalar_mul_fixed_window_*). ``windows`` is
        (n_windows, B) int32, 4-bit digits MSB first."""

        table = self._window_table(P, w)

        def body(acc, dig):
            # window body in b-land: one restack per window
            accb = self._unstack(acc)
            for _ in range(w):
                accb = self.double_b(accb)
            q = self._ct_lookup(table, dig)
            accb = self.add_b(accb, self._unstack(q))
            return self._stack(accb), None

        ident = self.identity(P.x.shape[1:])
        acc = ProjPoint(*(c + P.x * 0 for c in ident))
        acc, _ = jax.lax.scan(body, acc, windows)
        return acc

    def mul_base(self, scalar_bytes_le, tables=None):
        """Comb fixed-base multiply (reference projective.rs:898-951 +
        curve_macros.rs:55-63). The comb is always available (built lazily
        by the oracle). ``tables`` threads the comb data as runtime arrays
        (params/comb.py); None embeds constants (CPU tests only)."""
        from ..params.comb import get_weierstrass_comb

        comb = get_weierstrass_comb(self)
        return comb.mul_base(scalar_bytes_le, tables)

    # -- SEC1 compressed wire format -----------------------------------

    def compress(self, P: ProjPoint):
        """(1 + n_bytes, B): 0x02/0x03 prefix then big-endian x
        (reference affine.rs:22-32 compress)."""
        f = self.field
        ax, ay = self.to_affine(P)
        xb = f.to_bytes_be(ax)
        tag = (f.sgn0(ay) + 2).astype(jnp.int32)
        return jnp.concatenate([tag[None], xb], axis=0)

    def decompress(self, by):
        """Inverse of compress -> (ProjPoint, valid mask)
        (reference affine.rs:34-55 decompress)."""
        f = self.field
        batch = by.shape[1:]
        tag = by[0]
        x, okx = f.from_bytes_be(by[1:])
        rhs = f.add(
            f.mul(f.square(x), x),
            f.add(
                f.mul(self._c(self.a, batch), x),
                self._c(self.b_coeff, batch),
            ),
        )
        y, oky = f.sqrt(rhs)
        want_odd = (tag & 1).astype(jnp.int32)
        y = f.select(f.sgn0(y) == want_odd, y, f.neg(y))
        valid = jnp.logical_and(okx, oky)
        valid = jnp.logical_and(valid, jnp.logical_or(tag == 2, tag == 3))
        return self.from_affine(x, y), valid
