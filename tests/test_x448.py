"""X448: RFC 7748 vectors + oracle cross-checks (reference
/root/reference/src/protocol/x448.rs:116-164)."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from eccoxide_tpu.protocol import x448 as px
from eccoxide_tpu.oracle.curve import mont_ladder

P = 2**448 - 2**224 - 1

# RFC 7748 §5.2 test vector 1 for X448
V1_SCALAR = bytes.fromhex(
    "3d262fddf9ec8e88495266fea19a34d28882acef045104d0d1aae121"
    "700a779c984c24f8cdd78fbff44943eba368f54b29259a4f1c600ad3"
)
V1_U = bytes.fromhex(
    "06fce640fa3487bfda5f6cf2d5263f8aad88334cbd07437f020f08f9"
    "814dc031ddbdc38c19c6da2583fa5429db94ada18aa7a7fb4ef8a086"
)
V1_OUT = bytes.fromhex(
    "ce3e4ff95a60dc6697da1db1d85e6afbdf79b50a2412d7546d5f239f"
    "e14fbaadeb445fc66a01b0779d98223961111e21766282f73dd96b6f"
)


def _oracle_x448(scalar: bytes, u: bytes) -> bytes:
    k = int.from_bytes(scalar, "little")
    k &= ~3
    k |= 1 << 447
    uu = int.from_bytes(u, "little") % P
    out = mont_ladder(P, 39082, uu, k, 448)
    return out.to_bytes(56, "little")


def test_oracle_vector():
    assert _oracle_x448(V1_SCALAR, V1_U) == V1_OUT


def test_rfc7748_x448_vector1():
    assert px.x448_host(V1_SCALAR, V1_U) == V1_OUT


def test_dh_commutes_and_matches_oracle():
    rng = random.Random(21)
    a = bytes(rng.randrange(256) for _ in range(56))
    b = bytes(rng.randrange(256) for _ in range(56))
    pa = px.x448_base_host(a)
    pb = px.x448_base_host(b)
    base5 = (5).to_bytes(56, "little")
    assert pa == _oracle_x448(a, base5)
    sab = px.x448_host(a, pb)
    sba = px.x448_host(b, pa)
    assert sab == sba
    assert sab == _oracle_x448(a, pb)


def test_batch():
    rng = random.Random(22)
    B = 4
    scs = [bytes(rng.randrange(256) for _ in range(56)) for _ in range(B)]
    us = [bytes(rng.randrange(256) for _ in range(56)) for _ in range(B)]
    sb = jnp.asarray(
        np.stack([np.frombuffer(s, np.uint8) for s in scs], axis=1).astype(np.int32)
    )
    ub = jnp.asarray(
        np.stack([np.frombuffer(u, np.uint8) for u in us], axis=1).astype(np.int32)
    )
    out = np.asarray(jax.jit(px.x448)(sb, ub))
    for j in range(B):
        got = bytes(int(out[i, j]) for i in range(56))
        assert got == _oracle_x448(scs[j], us[j])
