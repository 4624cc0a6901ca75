"""Textbook ristretto255 oracle (Python ints), straight from RFC 9496
pseudocode, for cross-checking the batched implementation."""

from __future__ import annotations

P = 2**255 - 19
D = (-121665 * pow(121666, -1, P)) % P
SQRT_M1 = pow(2, (P - 1) // 4, P)
ONE_MINUS_D_SQ = (1 - D * D) % P
D_MINUS_ONE_SQ = ((D - 1) ** 2) % P


def _is_neg(x):
    return x % 2 == 1


def _abs(x):
    return P - x if _is_neg(x) else x


def _even_sqrt(x):
    x %= P
    r = pow(x, (P + 3) // 8, P)
    if (r * r - x) % P:
        r = r * SQRT_M1 % P
    assert (r * r - x) % P == 0
    return _abs(r)


# RFC 9496 fixes SQRT_AD_MINUS_ONE to the ODD root of a*d - 1 (the even
# root encodes a different — wrong — point through the Elligator map; the
# mistake was caught by the A.3 one-way-map literals, not by any
# self-consistency test: a shared even-root convention here and in
# curves/ristretto255.py agreed with itself and disagreed with the RFC).
SQRT_AD_MINUS_ONE = P - _even_sqrt(-1 - D)
INVSQRT_A_MINUS_D = _even_sqrt(pow((-1 - D) % P, -1, P))


def sqrt_ratio_m1(u, v):
    v3 = v * v % P * v % P
    v7 = v3 * v3 % P * v % P
    r = u * v3 % P * pow(u * v7 % P, (P - 5) // 8, P) % P
    check = v * r % P * r % P
    correct = check == u % P
    flipped = check == (-u) % P
    flipped_i = check == (-u * SQRT_M1) % P
    if flipped or flipped_i:
        r = r * SQRT_M1 % P
    return (correct or flipped), _abs(r)


def _ed_add(p1, p2):
    x1, y1, z1, t1 = p1
    x2, y2, z2, t2 = p2
    A = (y1 - x1) * (y2 - x2) % P
    B = (y1 + x1) * (y2 + x2) % P
    C = t1 * (2 * D) % P * t2 % P
    Dv = 2 * z1 * z2 % P
    E, F, G, H = (B - A) % P, (Dv - C) % P, (Dv + C) % P, (B + A) % P
    return (E * F % P, G * H % P, F * G % P, E * H % P)


_gy = (4 * pow(5, -1, P)) % P
_xx = (_gy * _gy - 1) * pow(D * _gy * _gy + 1, -1, P) % P
_gx = pow(_xx, (P + 3) // 8, P)
if (_gx * _gx - _xx) % P:
    _gx = _gx * SQRT_M1 % P
if _gx % 2:
    _gx = P - _gx
BASE = (_gx, _gy, 1, _gx * _gy % P)
IDENT = (0, 1, 1, 0)


def mul(k, pt=BASE):
    acc = IDENT
    while k:
        if k & 1:
            acc = _ed_add(acc, pt)
        pt = _ed_add(pt, pt)
        k >>= 1
    return acc


def compress(pt) -> bytes:
    x0, y0, z0, t0 = pt
    u1 = (z0 + y0) * (z0 - y0) % P
    u2 = x0 * y0 % P
    _, invsqrt = sqrt_ratio_m1(1, u1 * u2 % P * u2 % P)
    den1 = invsqrt * u1 % P
    den2 = invsqrt * u2 % P
    z_inv = den1 * den2 % P * t0 % P
    if _is_neg(t0 * z_inv % P):
        x, y = y0 * SQRT_M1 % P, x0 * SQRT_M1 % P
        den_inv = den1 * INVSQRT_A_MINUS_D % P
    else:
        x, y = x0, y0
        den_inv = den2
    if _is_neg(x * z_inv % P):
        y = (-y) % P
    s = _abs(den_inv * (z0 - y) % P)
    return s.to_bytes(32, "little")


def decompress(by: bytes):
    s = int.from_bytes(by, "little")
    if s >= P or _is_neg(s):
        return None
    ss = s * s % P
    u1 = (1 - ss) % P
    u2 = (1 + ss) % P
    u2_sqr = u2 * u2 % P
    v = (-(D * u1 % P * u1) - u2_sqr) % P
    ok, invsqrt = sqrt_ratio_m1(1, v * u2_sqr % P)
    if not ok:
        return None
    den_x = invsqrt * u2 % P
    den_y = invsqrt * den_x % P * v % P
    x = _abs(2 * s * den_x % P)
    y = u1 * den_y % P
    t = x * y % P
    if _is_neg(t) or y == 0:
        return None
    return (x, y, 1, t)


def eq(p, q):
    x1, y1, _, _ = p
    x2, y2, _, _ = q
    return (x1 * y2 - y1 * x2) % P == 0 or (y1 * y2 - x1 * x2) % P == 0


def elligator(r0):
    r = SQRT_M1 * r0 % P * r0 % P
    n_s = (r + 1) * ONE_MINUS_D_SQ % P
    c = (-1) % P
    d_ = (c - D * r) % P * (r + D) % P
    ok, s = sqrt_ratio_m1(n_s, d_)
    s_prime = (-_abs(s * r0 % P)) % P
    if not ok:
        s = s_prime
        c = r
    n_t = (c * (r - 1) % P * D_MINUS_ONE_SQ - d_) % P
    w0 = 2 * s * d_ % P
    w1 = n_t * SQRT_AD_MINUS_ONE % P
    w2 = (1 - s * s) % P
    w3 = (1 + s * s) % P
    return (w0 * w3 % P, w2 * w1 % P, w1 * w3 % P, w0 * w2 % P)


def from_uniform_bytes(by: bytes):
    r0 = int.from_bytes(by[:32], "little") & ((1 << 255) - 1)
    r1 = int.from_bytes(by[32:], "little") & ((1 << 255) - 1)
    return _ed_add(elligator(r0), elligator(r1))
