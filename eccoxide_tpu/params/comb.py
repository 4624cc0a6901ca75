"""Fixed-base comb tables, generated at first use by the Python oracle.

TPU-native counterpart of the reference's generated comb parameter files
(/root/reference/src/params/comb/*.rs, produced by sage/comb.sage) and the
OnceLock-cached generator_comb (curve_macros.rs:133-142): window width 4,
NW windows, entries [j * 16^i]B for j = 1..15 plus the identity at index 0.
mul_base then needs zero point doublings — one constant-time table lookup
and one complete addition per window (projective.rs:898-911).

The lookup is a one-hot (16, B) x table (16, n) contraction — an integer
matmul that XLA maps well (and is trivially constant-time: every entry is
touched for every batch element).

Tables are generated in milliseconds with the incremental oracle
(4 doublings + 15 additions per window), so they are built lazily in-process
rather than checked in.

IMPORTANT (TPU runtime discipline): table data must be passed INTO jitted
functions as runtime arguments, never closure-captured or embedded as
constants. Embedding the ~250KB comb tables as XLA constants flips the
remote TPU runtime into a persistently degraded dispatch mode (~50ms/call
for every program thereafter, measured on v5e via axon). ``tables()``
returns the host numpy data; callers stage it once with jax.device_put and
thread it through their jit boundaries.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_tables: dict = {}
_combs: dict = {}


def _gen_table_edwards(spec) -> list[list[tuple[int, int]]]:
    """NW x 16 affine (x, y) integer table for a twisted Edwards generator."""
    from ..oracle.curve import ECurve

    o = ECurve(
        p=spec.field.p, a=spec.a % spec.field.p, d=spec.d % spec.field.p,
        gx=spec.gx, gy=spec.gy, order=spec.scalar.p,
    )
    n_windows = -(-spec.scalar.p.bit_length() // 4)
    win = []
    base = (spec.gx, spec.gy)
    for _ in range(n_windows):
        entries = [(0, 1)]
        acc = base
        for _ in range(15):
            entries.append(acc)
            acc = o.add(acc, base)
        win.append(entries)
        base = acc  # acc == [16] * window base
    return win


def _gen_table_weierstrass(spec) -> list[list[tuple[int, int] | None]]:
    """NW x 16 affine table for a short-Weierstrass generator; index 0 is
    None (infinity), handled by the caller's projective identity."""
    from ..oracle.curve import WCurve

    o = WCurve(
        p=spec.field.p, a=spec.a % spec.field.p, b=spec.b_coeff % spec.field.p,
        gx=spec.gx, gy=spec.gy, order=spec.scalar.p,
    )
    n_windows = -(-spec.scalar.p.bit_length() // 4)
    win = []
    base = (spec.gx, spec.gy)
    for _ in range(n_windows):
        entries = [None]
        acc = base
        for _ in range(15):
            entries.append(acc)
            acc = o.add(acc, base)
        win.append(entries)
        base = acc
    return win


class EdwardsComb:
    """Comb fixed-base multiplier for a twisted Edwards group."""

    def __init__(self, spec):
        self.spec = spec
        f = spec.field
        tbl = _gen_table_edwards(spec)
        self.n_windows = len(tbl)
        from ..limbs import int_to_limbs

        def enc(v):
            return int_to_limbs(f._encode_int(v), f.n, f.b)[:, 0]

        xs = np.zeros((self.n_windows, 16, f.n), dtype=np.int32)
        ys = np.zeros_like(xs)
        ts = np.zeros_like(xs)
        for i, entries in enumerate(tbl):
            for j, (x, y) in enumerate(entries):
                xs[i, j] = enc(x)
                ys[i, j] = enc(y)
                ts[i, j] = enc((x * y) % f.p)
        # kept as numpy: converting to device arrays here would capture
        # trace-local constants when the comb is first built under jit
        self.xs, self.ys, self.ts = xs, ys, ts

    def tables(self):
        """Host numpy table data (xs, ys, ts), each (NW, 16, n) int32.
        Stage once with jax.device_put and pass to mul_base as an
        argument (see module docstring for why)."""
        return (self.xs, self.ys, self.ts)

    def mul_base(self, scalar_bytes, tables=None):
        """[s]B from (nbytes, B) LE scalar bytes; NW lookups + NW complete
        mixed additions, no doublings. ``tables`` is the (xs, ys, ts)
        triple from .tables() threaded as runtime arrays; None falls back
        to embedding constants (CPU tests only — never on TPU)."""
        spec = self.spec
        f = spec.field
        batch = scalar_bytes.shape[1:]
        if tables is None:
            tables = self.tables()
        txs, tys, tts = (jnp.asarray(t) for t in tables)
        digits = jnp.stack(
            [
                (scalar_bytes[i // 2] >> (4 * (i % 2))) & 0xF
                for i in range(self.n_windows)
            ]
        )  # (NW, B), window i = bits 4i..4i+3

        def body(acc, inp):
            dig, tx, ty, tt = inp
            sel = (
                jnp.arange(16, dtype=jnp.int32)[:, None] == dig[None, :]
            ).astype(jnp.int32)  # (16, B)
            qx = jnp.einsum("kb,kn->nb", sel, tx)
            qy = jnp.einsum("kb,kn->nb", sel, ty)
            qt = jnp.einsum("kb,kn->nb", sel, tt)
            acc = spec.add_mixed(acc, qx, qy, qt)
            return acc, None

        ident = spec.identity(batch)
        acc = type(ident)(*(c + scalar_bytes[0] * 0 for c in ident))
        acc, _ = jax.lax.scan(body, acc, (digits, txs, tys, tts))
        return acc


class WeierstrassComb:
    """Comb fixed-base multiplier for a short-Weierstrass group. Entry 0 of
    every window is the identity, realized projectively as (0 : 1 : 0) via a
    masked Z (the reference stores index 0 as infinity too,
    projective.rs:450-471)."""

    def __init__(self, spec):
        self.spec = spec
        f = spec.field
        tbl = _gen_table_weierstrass(spec)
        self.n_windows = len(tbl)
        from ..limbs import int_to_limbs

        def enc(v):
            return int_to_limbs(f._encode_int(v), f.n, f.b)[:, 0]

        xs = np.zeros((self.n_windows, 16, f.n), dtype=np.int32)
        ys = np.zeros_like(xs)
        for i, entries in enumerate(tbl):
            for j, e in enumerate(entries):
                x, y = (0, 1) if e is None else e
                xs[i, j] = enc(x)
                ys[i, j] = enc(y)
        self.xs, self.ys = xs, ys

    def tables(self):
        """Host numpy table data (xs, ys), each (NW, 16, n) int32."""
        return (self.xs, self.ys)

    def mul_base(self, scalar_bytes, tables=None):
        from ..curves.weierstrass import ProjPoint

        spec = self.spec
        f = spec.field
        batch = scalar_bytes.shape[1:]
        if tables is None:
            tables = self.tables()
        txs, tys = (jnp.asarray(t) for t in tables)
        digits = jnp.stack(
            [
                (scalar_bytes[i // 2] >> (4 * (i % 2))) & 0xF
                for i in range(self.n_windows)
            ]
        )
        one = f.one(batch)
        zero = f.zero(batch)

        def body(acc, inp):
            dig, tx, ty = inp
            sel = (
                jnp.arange(16, dtype=jnp.int32)[:, None] == dig[None, :]
            ).astype(jnp.int32)
            qx = jnp.einsum("kb,kn->nb", sel, tx)
            qy = jnp.einsum("kb,kn->nb", sel, ty)
            qz = f.select(dig != 0, one, zero)
            acc = spec.add(acc, ProjPoint(qx, qy, qz))
            return acc, None

        ident = spec.identity(batch)
        acc = type(ident)(*(c + scalar_bytes[0] * 0 for c in ident))
        acc, _ = jax.lax.scan(body, acc, (digits, txs, tys))
        return acc


_byte_table = None


def edwards_byte_table():
    """Shared 256-entry affine table ([k]B for k = 0..255) for the
    verification-only Straus path (protocol/ed25519.py
    double_scalar_mul_base): one gather per 8-bit window of the public
    scalar S. Entry 0 is the identity (0, 1, t=0) — the complete addition
    law absorbs it. Returns (xs, ys, ts) numpy (256, n) int32."""
    global _byte_table
    if _byte_table is None:
        from ..curves import curve25519 as c255
        from ..oracle.curve import ECurve
        from ..limbs import int_to_limbs

        spec = c255.EDWARDS
        f = spec.field
        o = ECurve(
            p=f.p, a=spec.a % f.p, d=spec.d % f.p,
            gx=spec.gx, gy=spec.gy, order=spec.scalar.p,
        )

        def enc(v):
            return int_to_limbs(f._encode_int(v), f.n, f.b)[:, 0]

        xs = np.zeros((256, f.n), dtype=np.int32)
        ys = np.zeros_like(xs)
        ts = np.zeros_like(xs)
        ys[0] = enc(1)
        acc = (0, 1)
        for k in range(1, 256):
            acc = o.add(acc, (spec.gx, spec.gy))
            xs[k] = enc(acc[0])
            ys[k] = enc(acc[1])
            ts[k] = enc((acc[0] * acc[1]) % f.p)
        _byte_table = (xs, ys, ts)
    return _byte_table


def get_comb(name: str):
    """Comb object for a named group, or None if not registered."""
    if name in _combs:
        return _combs[name]
    if name == "edwards25519":
        from ..curves import curve25519 as c255

        _combs[name] = EdwardsComb(c255.EDWARDS)
        return _combs[name]
    return None


def get_weierstrass_comb(spec):
    key = "w:" + spec.name
    if key not in _combs:
        _combs[key] = WeierstrassComb(spec)
    return _combs[key]
