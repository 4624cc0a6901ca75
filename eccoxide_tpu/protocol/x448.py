"""X448 Diffie-Hellman (RFC 7748), batched.

TPU-native counterpart of /root/reference/src/protocol/x448.rs: clamp
(x448.rs:16-20), x448/x448_base (x448.rs:34-49), contributory check
(x448.rs:95-99). Byte layout: (56, B) int32 LE columns.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..curves import curve448 as c448
from ..curves.montgomery import ladder


def clamp(scalar_bytes):
    """RFC 7748 X448 clamp: clear low 2 bits, set top bit."""
    s = scalar_bytes
    s = s.at[0].set(s[0] & 0xFC)
    s = s.at[55].set(s[55] | 0x80)
    return s


def _bits_from_bytes(by, n_bits):
    return jnp.stack([(by[i // 8] >> (i % 8)) & 1 for i in range(n_bits)])


def x448(scalar_bytes, u_bytes):
    s = clamp(scalar_bytes)
    k_bits = _bits_from_bytes(s, 448)
    u = c448.decode_u(u_bytes)
    out = ladder(c448.MONT, u, k_bits)
    return c448.FQ.to_bytes_le(out)


def x448_base(scalar_bytes):
    B = scalar_bytes.shape[1]
    u5 = c448.FQ.bcast(c448.FQ.const(5), (B,))
    s = clamp(scalar_bytes)
    k_bits = _bits_from_bytes(s, 448)
    out = ladder(c448.MONT, u5, k_bits)
    return c448.FQ.to_bytes_le(out)


def was_contributory(shared_bytes):
    return jnp.any(shared_bytes != 0, axis=0)


# module-cached jits (a fresh jax.jit per call would retrace every time)
_jit_x448 = None
_jit_x448_base = None


def x448_host(scalar: bytes, u: bytes) -> bytes:
    global _jit_x448
    if _jit_x448 is None:
        _jit_x448 = jax.jit(x448)
    sb = jnp.asarray(np.frombuffer(scalar, np.uint8).astype(np.int32)[:, None])
    ub = jnp.asarray(np.frombuffer(u, np.uint8).astype(np.int32)[:, None])
    out = np.asarray(_jit_x448(sb, ub))
    return bytes(int(out[i, 0]) for i in range(56))


def x448_base_host(scalar: bytes) -> bytes:
    global _jit_x448_base
    if _jit_x448_base is None:
        _jit_x448_base = jax.jit(x448_base)
    sb = jnp.asarray(np.frombuffer(scalar, np.uint8).astype(np.int32)[:, None])
    out = np.asarray(_jit_x448_base(sb))
    return bytes(int(out[i, 0]) for i in range(56))
