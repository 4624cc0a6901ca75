"""X25519 Diffie-Hellman (RFC 7748), batched.

TPU-native counterpart of /root/reference/src/protocol/x25519.rs: clamp
(x25519.rs:15-20), u-decode with bit-255 mask (x25519.rs:24-29),
x25519/x25519_base (x25519.rs:36-51), and the all-zero contributory check
(x25519.rs:99-103). All functions operate on (32, B) int32 byte columns.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..curves import curve25519 as c255
from ..curves.montgomery import ladder


def clamp(scalar_bytes):
    """RFC 7748 clamping: clear low 3 bits, clear top bit, set bit 254."""
    s = scalar_bytes
    s = s.at[0].set(s[0] & 0xF8)
    s = s.at[31].set((s[31] & 0x7F) | 0x40)
    return s


def _bits_from_bytes(by, n_bits):
    """(nbytes, B) -> (n_bits, B) of 0/1 int32, bit i = coeff of 2^i."""
    outs = [(by[i // 8] >> (i % 8)) & 1 for i in range(n_bits)]
    return jnp.stack(outs)


def x25519(scalar_bytes, u_bytes):
    """scalar (32, B) x u (32, B) int32 LE byte columns -> shared-secret
    u-coordinate bytes (32, B)."""
    s = clamp(scalar_bytes)
    k_bits = _bits_from_bytes(s, 255)
    u = c255.decode_u(u_bytes)
    out = ladder(c255.MONT, u, k_bits)
    return c255.FQ.to_bytes_le(out)


def x25519_base(scalar_bytes):
    """[k]G on the base point u=9 (x25519.rs:46-51)."""
    B = scalar_bytes.shape[1]
    u9 = c255.FQ.bcast(c255.FQ.const(9), (B,))
    s = clamp(scalar_bytes)
    k_bits = _bits_from_bytes(s, 255)
    out = ladder(c255.MONT, u9, k_bits)
    return c255.FQ.to_bytes_le(out)


def was_contributory(shared_bytes):
    """False where the shared secret is all zero (low-order input point;
    x25519.rs:99-103)."""
    return jnp.any(shared_bytes != 0, axis=0)


# host-side convenience (single values, python bytes). The jitted graphs
# are cached at module level — a fresh jax.jit per call would retrace
# every invocation.
_jit_x25519 = None
_jit_x25519_base = None


def x25519_host(scalar: bytes, u: bytes) -> bytes:
    global _jit_x25519
    if _jit_x25519 is None:
        _jit_x25519 = jax.jit(x25519)
    sb = jnp.asarray(np.frombuffer(scalar, np.uint8).astype(np.int32)[:, None])
    ub = jnp.asarray(np.frombuffer(u, np.uint8).astype(np.int32)[:, None])
    out = np.asarray(_jit_x25519(sb, ub))
    return bytes(int(out[i, 0]) for i in range(32))


def x25519_base_host(scalar: bytes) -> bytes:
    global _jit_x25519_base
    if _jit_x25519_base is None:
        _jit_x25519_base = jax.jit(x25519_base)
    sb = jnp.asarray(np.frombuffer(scalar, np.uint8).astype(np.int32)[:, None])
    out = np.asarray(_jit_x25519_base(sb))
    return bytes(int(out[i, 0]) for i in range(32))
