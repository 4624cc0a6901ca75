"""Oracle curve arithmetic: short-Weierstrass (Jacobian-free, affine with
branches), twisted Edwards, and the Montgomery ladder — all plain Python.

Deliberately written in the naive affine style (mod-inverse per add) so it
shares no structure with the batched engines it validates.
"""

from __future__ import annotations

from dataclasses import dataclass


def inv(x, p):
    return pow(x, -1, p)


# ---------------------------------------------------------------------------
# short Weierstrass y^2 = x^3 + a x + b; points: None = infinity, else (x, y)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class WCurve:
    p: int
    a: int
    b: int
    gx: int
    gy: int
    order: int

    def on_curve(self, pt):
        if pt is None:
            return True
        x, y = pt
        return (y * y - (x * x * x + self.a * x + self.b)) % self.p == 0

    def add(self, p1, p2):
        p = self.p
        if p1 is None:
            return p2
        if p2 is None:
            return p1
        x1, y1 = p1
        x2, y2 = p2
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            lam = (3 * x1 * x1 + self.a) * inv(2 * y1, p) % p
        else:
            lam = (y2 - y1) * inv(x2 - x1, p) % p
        x3 = (lam * lam - x1 - x2) % p
        y3 = (lam * (x1 - x3) - y1) % p
        return (x3, y3)

    def mul(self, k, pt):
        acc = None
        while k:
            if k & 1:
                acc = self.add(acc, pt)
            pt = self.add(pt, pt)
            k >>= 1
        return acc

    def mul_base(self, k):
        return self.mul(k, (self.gx, self.gy))


# ---------------------------------------------------------------------------
# twisted Edwards a x^2 + y^2 = 1 + d x^2 y^2; points are (x, y) affine
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ECurve:
    p: int
    a: int
    d: int
    gx: int
    gy: int
    order: int

    def on_curve(self, pt):
        x, y = pt
        l = (self.a * x * x + y * y) % self.p
        r = (1 + self.d * x * x * y * y) % self.p
        return l == r

    def add(self, p1, p2):
        p = self.p
        x1, y1 = p1
        x2, y2 = p2
        dxy = self.d * x1 * x2 * y1 * y2 % p
        x3 = (x1 * y2 + y1 * x2) * inv(1 + dxy, p) % p
        y3 = (y1 * y2 - self.a * x1 * x2) * inv(1 - dxy, p) % p
        return (x3, y3)

    def mul(self, k, pt):
        acc = (0, 1)
        while k:
            if k & 1:
                acc = self.add(acc, pt)
            pt = self.add(pt, pt)
            k >>= 1
        return acc

    def mul_base(self, k):
        return self.mul(k, (self.gx, self.gy))


# ---------------------------------------------------------------------------
# Montgomery ladder (x-only), for X25519/X448 oracle
# ---------------------------------------------------------------------------

def mont_ladder(p: int, a24: int, u: int, k: int, n_bits: int) -> int:
    x2, z2, x3, z3 = 1, 0, u, 1
    swap = 0
    for t in range(n_bits - 1, -1, -1):
        kt = (k >> t) & 1
        if swap ^ kt:
            x2, x3 = x3, x2
            z2, z3 = z3, z2
        swap = kt
        A = (x2 + z2) % p
        AA = A * A % p
        B = (x2 - z2) % p
        BB = B * B % p
        E = (AA - BB) % p
        C = (x3 + z3) % p
        D = (x3 - z3) % p
        DA = D * A % p
        CB = C * B % p
        x3 = (DA + CB) % p
        x3 = x3 * x3 % p
        z3 = (DA - CB) % p
        z3 = u * z3 * z3 % p
        x2 = AA * BB % p
        # a24 = (A+2)/4 convention: z2 = E * (BB + a24*E)
        z2 = E * (BB + a24 * E) % p
    if swap:
        x2, z2 = x3, z3
    return x2 * pow(z2, p - 2, p) % p
