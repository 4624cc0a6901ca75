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


# RFC 7748 §5.2 test vector 2 for X448 (reference x448.rs:127-133)
V2_SCALAR = bytes.fromhex(
    "203d494428b8399352665ddca42f9de8fef600908e0d461cb021f8c538345dd7"
    "7c3e4806e25f46d3315c44e0a5b4371282dd2c8d5be3095f"
)
V2_U = bytes.fromhex(
    "0fbcc2f993cd56d3305b0b7d9e55d4c1a8fb5dbb52f8e9a1e9b6201b165d0158"
    "94e56c4d3570bee52fe205e28a78b91cdfbde71ce8d157db"
)
V2_OUT = bytes.fromhex(
    "884a02576239ff7a2f2f63b2db6a9ff37047ac13568e1e30fe63c4a7ad1b3ee3"
    "a5700df34321d62077e63633c575c1c954514e99da7c179d"
)

# RFC 7748 §6.2 Diffie-Hellman (reference x448.rs:136-164)
DH_A_PRIV = bytes.fromhex(
    "9a8f4925d1519f5775cf46b04b5800d4ee9ee8bae8bc5565d498c28dd9c9baf5"
    "74a9419744897391006382a6f127ab1d9ac2d8c0a598726b"
)
DH_A_PUB = bytes.fromhex(
    "9b08f7cc31b7e3e67d22d5aea121074a273bd2b83de09c63faa73d2c22c5d9bb"
    "c836647241d953d40c5b12da88120d53177f80e532c41fa0"
)
DH_B_PRIV = bytes.fromhex(
    "1c306a7ac2a0e2e0990b294470cba339e6453772b075811d8fad0d1d6927c120"
    "bb5ee8972b0d3e21374c9c921b09d1b0366f10b65173992d"
)
DH_B_PUB = bytes.fromhex(
    "3eb7a829b0cd20f5bcfc0b599b6feccf6da4627107bdb0d4f345b43027d8b972"
    "fc3e34fb4232a13ca706dcb57aec3dae07bdc1c67bf33609"
)
DH_SHARED = bytes.fromhex(
    "07fff4181ac6cc95ec1c16a94a0f74d12da232ce40a77552281d282bb60c0b56"
    "fd2464c335543936521c24403085d59a449a5037514a879d"
)


def test_rfc7748_x448_vector2():
    assert px.x448_host(V2_SCALAR, V2_U) == V2_OUT


def test_rfc7748_x448_dh_6_2():
    assert px.x448_base_host(DH_A_PRIV) == DH_A_PUB
    assert px.x448_base_host(DH_B_PRIV) == DH_B_PUB
    assert px.x448_host(DH_A_PRIV, DH_B_PUB) == DH_SHARED
    assert px.x448_host(DH_B_PRIV, DH_A_PUB) == DH_SHARED
