"""Limb-vector <-> integer/byte conversions for the batched field engines.

TPU-native representation: a batch of field elements is a single int32 array
of shape ``(n_limbs, B)`` — limbs on the sublane axis, batch on the lane axis
(the last dimension maps to the 128-wide VPU lanes).  Each limb holds ``b``
bits (b = 12 or 13), far below the int32 width, so schoolbook partial
products and column sums accumulate in int32 without overflow (bounds are
verified at field-construction time, see field.py).

This replaces the reference's fiat-crypto 64-bit saturated limbs
(/root/reference/src/curve/fiat/p256_64.rs:2) with a representation that the
TPU VPU can multiply natively; the unsaturated style follows the reference's
own solinas backend (/root/reference/src/curve/fiat/curve25519_64.rs) rather
than its word-by-word Montgomery backend.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def int_to_limbs(v: int, n: int, b: int) -> np.ndarray:
    """Integer -> (n, 1) int32 limb column (radix 2^b, little-endian limbs)."""
    if v < 0:
        raise ValueError("int_to_limbs expects a non-negative value")
    mask = (1 << b) - 1
    out = np.zeros((n, 1), dtype=np.int32)
    for i in range(n):
        out[i, 0] = (v >> (i * b)) & mask
    if v >> (n * b):
        raise ValueError(f"value does not fit in {n} limbs of {b} bits")
    return out


def limbs_to_ints(arr, b: int) -> list[int]:
    """(n, B) limb array -> list of B Python ints (host-side; for tests/serde).

    Accepts non-normalized (even negative) limbs; evaluates sum(limb_i 2^(bi)).
    """
    a = np.asarray(arr)
    n, batch = a.shape
    out = []
    for j in range(batch):
        v = 0
        for i in range(n):
            v += int(a[i, j]) << (i * b)
        out.append(v)
    return out


def ints_to_limbs(vals, n: int, b: int):
    """List of B ints -> (n, B) int32 jnp array."""
    cols = [int_to_limbs(v, n, b) for v in vals]
    return jnp.asarray(np.concatenate(cols, axis=1))


def bytes_to_limbs_le(data: bytes, n: int, b: int) -> np.ndarray:
    return int_to_limbs(int.from_bytes(data, "little"), n, b)


# ---------------------------------------------------------------------------
# Static bit-repacking plans: radix-2^b limbs <-> radix-2^8 bytes.
# All shifts/indices are Python-level constants, so under jit these unroll to
# straight-line vector ops (no gathers, no data-dependent control flow).
# ---------------------------------------------------------------------------

def limbs_to_bytes_le(x, n_bytes: int, b: int):
    """(n, B) normalized limbs (< 2^b) -> (n_bytes, B) int32 bytes (LE).

    Equivalent of fiat's to_bytes (reference field_macros.rs:165-210) but
    vectorized over the batch axis.
    """
    n = x.shape[0]
    outs = []
    for j in range(n_bytes):
        bit = 8 * j
        q, r = divmod(bit, b)
        if q >= n:
            outs.append(jnp.zeros_like(x[0]))
            continue
        v = (x[q] >> r)
        # bits available from limb q: b - r; may need the next limb's low bits
        if b - r < 8 and q + 1 < n:
            v = v | (x[q + 1] << (b - r))
        outs.append(v & 0xFF)
    return jnp.stack(outs)


def bytes_le_to_limbs(by, n: int, b: int):
    """(n_bytes, B) int32 bytes (LE, each < 256) -> (n, B) int32 limbs < 2^b.

    Inverse of limbs_to_bytes_le for values that fit n*b bits.
    """
    n_bytes = by.shape[0]
    mask = (1 << b) - 1
    outs = []
    for i in range(n):
        bit = i * b
        q, r = divmod(bit, 8)
        if q >= n_bytes:
            outs.append(jnp.zeros_like(by[0]))
            continue
        v = by[q] >> r
        got = 8 - r
        k = 1
        while got < b and q + k < n_bytes:
            v = v | (by[q + k] << got)
            got += 8
            k += 1
        outs.append(v & mask)
    return jnp.stack(outs)
