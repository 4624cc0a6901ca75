"""Twisted Edwards groups in extended coordinates (X:Y:Z:T), batched.

TPU-native counterpart of the reference's edwards25519 group
(/root/reference/src/curve/curve25519.rs:560-871): dedicated a=-1 complete
addition (curve25519.rs:645-660) and extended-coordinate doubling
(curve25519.rs:626-642), with constant-time windowed scalar multiplication
replacing the reference's bit-by-bit CT double-and-add
(curve25519.rs:676-687). All selects are batch-wide masked arithmetic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..field import Field


class ExtPoint(NamedTuple):
    """Extended coordinates; T = X*Y/Z."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    t: jax.Array


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

    def double(self, p: ExtPoint, need_t: bool = True) -> ExtPoint:
        """dbl-2008-hwcd; complete, any a (reference curve25519.rs:626-642).

        ``need_t=False`` skips the E*H product: only additions consume the
        extended T coordinate, so the first w-1 doubles of a window chain
        can run 7M instead of 8M (t is set to 0 — callers must not add
        from such a point without re-doubling)."""
        f = self.field
        A = f.square(p.x)
        B = f.square(p.y)
        C = f.double(f.square(p.z))
        if self.a == -1:
            D = f.neg(A)
        else:
            D = f.mul(f.bcast(f.const(self.a), A.shape[1:]), A)
        E = f.sub(f.sub(f.square(f.add(p.x, p.y)), A), B)
        G = f.add(D, B)
        Fv = f.sub(G, C)
        H = f.sub(D, B)
        t = f.mul(E, H) if need_t else E * 0
        return ExtPoint(f.mul(E, Fv), f.mul(G, H), f.mul(Fv, G), t)

    def add(self, p: ExtPoint, q: ExtPoint) -> ExtPoint:
        """Complete addition. a=-1: add-2008-hwcd-3 (reference
        curve25519.rs:645-660); otherwise add-2008-hwcd."""
        f = self.field
        if self.a == -1:
            A = f.mul(f.sub(p.y, p.x), f.sub(q.y, q.x))
            B = f.mul(f.add(p.y, p.x), f.add(q.y, q.x))
            d2 = f.const((2 * self.d) % f.p)
            C = f.mul(f.mul(p.t, q.t), f.bcast(d2, p.t.shape[1:]))
            D = f.double(f.mul(p.z, q.z))
            E = f.sub(B, A)
            Fv = f.sub(D, C)
            G = f.add(D, C)
            H = f.add(B, A)
        else:
            A = f.mul(p.x, q.x)
            B = f.mul(p.y, q.y)
            dC = f.bcast(f.const(self.d % f.p), p.t.shape[1:])
            C = f.mul(dC, f.mul(p.t, q.t))
            D = f.mul(p.z, q.z)
            E = f.sub(
                f.sub(f.mul(f.add(p.x, p.y), f.add(q.x, q.y)), A), B
            )
            Fv = f.sub(D, C)
            G = f.add(D, C)
            aA = f.mul(f.bcast(f.const(self.a % f.p), A.shape[1:]), A)
            H = f.sub(B, aA)
        return ExtPoint(f.mul(E, Fv), f.mul(G, H), f.mul(Fv, G), f.mul(E, H))

    def add_mixed(self, p: ExtPoint, qx, qy, qt) -> ExtPoint:
        """Complete addition with an affine second operand (Z2 = 1,
        T2 = qx*qy): saves the Z1*Z2 multiply. Used by the comb fixed-base
        path (reference projective.rs:898-911 uses the same trick with
        affine table entries)."""
        f = self.field
        if self.a == -1:
            A = f.mul(f.sub(p.y, p.x), f.sub(qy, qx))
            B = f.mul(f.add(p.y, p.x), f.add(qy, qx))
            d2 = f.const((2 * self.d) % f.p)
            C = f.mul(f.mul(p.t, qt), f.bcast(d2, p.t.shape[1:]))
            D = f.double(p.z)
            E = f.sub(B, A)
            Fv = f.sub(D, C)
            G = f.add(D, C)
            H = f.add(B, A)
            return ExtPoint(
                f.mul(E, Fv), f.mul(G, H), f.mul(Fv, G), f.mul(E, H)
            )
        q = ExtPoint(qx, qy, f.one(qx.shape[1:]), qt)
        return self.add(p, q)

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
        return ExtPoint(
            jnp.concatenate([ident.x[None], ys.x], axis=0),
            jnp.concatenate([ident.y[None], ys.y], axis=0),
            jnp.concatenate([ident.z[None], ys.z], axis=0),
            jnp.concatenate([ident.t[None], ys.t], axis=0),
        )

    def _ct_lookup(self, table: ExtPoint, idx, w: int = 4):
        """Constant-time table scan: masked sum over all 2^w entries
        (the analogue of the reference's full-scan select_from_table,
        curve25519.rs:794-804)."""
        size = table.x.shape[0]
        sel = (
            jnp.arange(size, dtype=jnp.int32)[:, None] == idx[None, :]
        )  # (2^w, B)

        def pick(coord):  # coord: (2^w, n, B)
            return jnp.sum(
                jnp.where(sel[:, None, :], coord, 0), axis=0, dtype=jnp.int32
            )

        return ExtPoint(pick(table.x), pick(table.y), pick(table.z), pick(table.t))

    def scalar_mul(self, p: ExtPoint, windows, w: int = 4) -> ExtPoint:
        """Constant-time fixed-window scalar mul. ``windows`` is a
        (n_windows, B) int32 array of w-bit digits, most significant first.
        Replaces the reference's 256-step CT double-and-add scale_bytes
        (curve25519.rs:676-687) with a windowed variant: 4x fewer complete
        additions."""
        f = self.field
        table = self._window_table(p, w)

        def body(acc, dig):
            for i in range(w):
                acc = self.double(acc, need_t=(i == w - 1))
            q = self._ct_lookup(table, dig, w)
            return self.add(acc, q), None

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
