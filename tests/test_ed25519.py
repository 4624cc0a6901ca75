"""Ed25519: RFC 8032 vectors, library cross-check, batched sign/verify.

Mirrors the reference's protocol tests (/root/reference/src/protocol/
ed25519.rs:264-361): RFC 8032 §7.1 vectors, keypair-path determinism,
tamper rejection, message-length sweep — plus cross-validation of both the
oracle and the batched TPU path against the system `cryptography` library.
"""

import random

import pytest

from eccoxide_tpu.oracle import ed25519 as orc
from eccoxide_tpu.protocol import ed25519 as ped

# RFC 8032 §7.1 TEST 1
T1_SK = bytes.fromhex(
    "9d61b19deffd5a60ba844af492ec2cc44449c5697b326919703bac031cae7f60"
)
T1_PK = bytes.fromhex(
    "d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a"
)
T1_SIG = bytes.fromhex(
    "e5564300c360ac729086e2cc806e828a84877f1eb8e5d974d873e065224901555f"
    "b8821590a33bacc61e39701cf9b46bd25bf5f0595bbe24655141438e7a100b"
)


def _lib_available():
    try:
        from cryptography.hazmat.primitives.asymmetric import ed25519  # noqa

        return True
    except Exception:
        return False


def test_oracle_rfc8032_test1():
    assert orc.public_key(T1_SK) == T1_PK
    assert orc.sign(T1_SK, b"") == T1_SIG
    assert orc.verify(T1_PK, b"", T1_SIG)


@pytest.mark.skipif(not _lib_available(), reason="cryptography not present")
def test_oracle_vs_library():
    from cryptography.hazmat.primitives.asymmetric.ed25519 import (
        Ed25519PrivateKey,
    )

    rng = random.Random(11)
    for i in range(4):
        sk = bytes(rng.randrange(256) for _ in range(32))
        msg = bytes(rng.randrange(256) for _ in range(i * 17))
        lk = Ed25519PrivateKey.from_private_bytes(sk)
        lib_sig = lk.sign(msg)
        assert orc.sign(sk, msg) == lib_sig
        assert orc.public_key(sk) == lk.public_key().public_bytes_raw()


def test_batched_keygen_matches_oracle():
    rng = random.Random(12)
    sks = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(4)]
    pks = ped.public_keys_host(sks)
    for sk, pk in zip(sks, pks):
        assert pk == orc.public_key(sk)


def test_batched_sign_matches_oracle():
    rng = random.Random(13)
    B = 4
    sks = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(B)]
    msgs = [bytes(rng.randrange(256) for _ in range(j * 13)) for j in range(B)]
    sigs = ped.sign_host(sks, msgs)
    for sk, m, s in zip(sks, msgs, sigs):
        assert s == orc.sign(sk, m)


def test_rfc8032_test1_batched():
    sigs = ped.sign_host([T1_SK], [b""])
    assert sigs[0] == T1_SIG
    assert ped.verify_host([T1_PK], [b""], sigs) == [True]


def test_batched_verify_accept_reject():
    rng = random.Random(14)
    B = 6
    sks = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(B)]
    msgs = [bytes(rng.randrange(256) for _ in range(20)) for _ in range(B)]
    pks = [orc.public_key(sk) for sk in sks]
    sigs = [orc.sign(sk, m) for sk, m in zip(sks, msgs)]
    # tamper with signature 1 (flip a bit in S), message 3, and pk 5
    bad_sigs = list(sigs)
    bad_sigs[1] = sigs[1][:33] + bytes([sigs[1][33] ^ 1]) + sigs[1][34:]
    bad_msgs = list(msgs)
    bad_msgs[3] = msgs[3][:-1] + bytes([msgs[3][-1] ^ 0x80])
    res = ped.verify_host(pks, bad_msgs, bad_sigs)
    assert res == [True, False, True, False, True, True]
    # non-canonical S (s + L) must be rejected
    s_int = int.from_bytes(sigs[0][32:], "little")
    L = orc.L
    if s_int + L < 2**256:
        forged = sigs[0][:32] + (s_int + L).to_bytes(32, "little")
        assert ped.verify_host([pks[0]], [msgs[0]], [forged]) == [False]
