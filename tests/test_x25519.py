"""X25519 end-to-end: RFC 7748 vectors + oracle cross-checks.

Mirrors the reference's protocol tests (/root/reference/src/protocol/
x25519.rs:118-160): §5.2 KAT and §6.1 Diffie-Hellman, plus batched
agreement against the independent Python ladder oracle.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp

from eccoxide_tpu.protocol import x25519 as px
from eccoxide_tpu.oracle.curve import mont_ladder

P = 2**255 - 19

# RFC 7748 §5.2 test vector 1
V1_SCALAR = bytes.fromhex(
    "a546e36bf0527c9d3b16154b82465edd62144c0ac1fc5a18506a2244ba449ac4"
)
V1_U = bytes.fromhex(
    "e6db6867583030db3594c1a424b15f7c726624ec26b3353b10a903a6d0ab1c4c"
)
V1_OUT = bytes.fromhex(
    "c3da55379de9c6908e94ea4df28d084f32eccf03491c71f754b4075577a28552"
)

# RFC 7748 §6.1 Diffie-Hellman
ALICE_PRIV = bytes.fromhex(
    "77076d0a7318a57d3c16c17251b26645df4c2f87ebc0992ab177fba51db92c2a"
)
ALICE_PUB = bytes.fromhex(
    "8520f0098930a754748b7ddcb43ef75a0dbf3a0d26381af4eba4a98eaa9b4e6a"
)
BOB_PRIV = bytes.fromhex(
    "5dab087e624a8a4b79e17f8b83800ee66f3bb1292618b6fd1c2f8b27ff88e0eb"
)
BOB_PUB = bytes.fromhex(
    "de9edb7d7b7dc1b4d35b61c2ece435373f8343c85b78674dadfc7e146f882b4f"
)
SHARED = bytes.fromhex(
    "4a5d9d5ba4ce2de1728e3bf480350f25e07e21c947d19e3376f09b3c1e161742"
)


def _oracle_x25519(scalar: bytes, u: bytes) -> bytes:
    k = int.from_bytes(scalar, "little")
    k &= ~7
    k &= (1 << 255) - 1
    k |= 1 << 254
    uu = int.from_bytes(u, "little") & ((1 << 255) - 1)
    out = mont_ladder(P, 121666, uu % P, k, 255)
    return out.to_bytes(32, "little")


def test_oracle_matches_rfc():
    # trust-but-verify the oracle itself against the RFC vector
    assert _oracle_x25519(V1_SCALAR, V1_U) == V1_OUT
    base = (9).to_bytes(32, "little")
    assert _oracle_x25519(ALICE_PRIV, base) == ALICE_PUB
    assert _oracle_x25519(BOB_PRIV, base) == BOB_PUB
    assert _oracle_x25519(ALICE_PRIV, BOB_PUB) == SHARED


def test_rfc7748_vector1():
    assert px.x25519_host(V1_SCALAR, V1_U) == V1_OUT


def test_rfc7748_dh():
    assert px.x25519_base_host(ALICE_PRIV) == ALICE_PUB
    assert px.x25519_base_host(BOB_PRIV) == BOB_PUB
    assert px.x25519_host(ALICE_PRIV, BOB_PUB) == SHARED
    assert px.x25519_host(BOB_PRIV, ALICE_PUB) == SHARED


def test_batch_vs_oracle():
    rng = random.Random(42)
    B = 8
    scs = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(B)]
    us = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(B)]
    sb = jnp.asarray(
        np.stack([np.frombuffer(s, np.uint8) for s in scs], axis=1).astype(np.int32)
    )
    ub = jnp.asarray(
        np.stack([np.frombuffer(u, np.uint8) for u in us], axis=1).astype(np.int32)
    )
    out = np.asarray(jax.jit(px.x25519)(sb, ub))
    for j in range(B):
        got = bytes(int(out[i, j]) for i in range(32))
        assert got == _oracle_x25519(scs[j], us[j])


def test_contributory():
    zero_u = bytes(32)
    shared = px.x25519_host(V1_SCALAR, zero_u)
    assert shared == bytes(32)
    mask = px.was_contributory(
        jnp.asarray(np.zeros((32, 1), np.int32))
    )
    assert not bool(mask[0])


# RFC 7748 §5.2 test vector 2 (reference x25519.rs:127-133)
V2_SCALAR = bytes.fromhex(
    "4b66e9d4d1b4673c5ad22691957d6af5c11b6421e0ea01d42ca4169e7918ba0d"
)
V2_U = bytes.fromhex(
    "e5210f12786811d3f4b7959d0538ae2c31dbe7106fc03c3efc4cd549c715a493"
)
V2_OUT = bytes.fromhex(
    "95cbde9476e8907d7aade45cb4b873f88b595a68799fa152e6f8f7647aac7957"
)

# RFC 7748 §5.2: one iteration of the base-point recurrence
# (reference x25519.rs:135-141)
IT1_K = bytes.fromhex(
    "0900000000000000000000000000000000000000000000000000000000000000"
)
IT1_OUT = bytes.fromhex(
    "422c8e7a6227d7bca1350b3e2bb7279f7897b87bb6854b783c60e80311ae3079"
)


def test_rfc7748_vector2():
    assert px.x25519_host(V2_SCALAR, V2_U) == V2_OUT


def test_rfc7748_iterated_once():
    assert px.x25519_base_host(IT1_K) == IT1_OUT
