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


# RFC 8032 §7.1 TESTs 2 and 3 (reference ed25519.rs:268-287)
RFC_VECTORS = [
    (T1_SK, T1_PK, b"", T1_SIG),
    (
        bytes.fromhex(
            "4ccd089b28ff96da9db6c346ec114e0f5b8a319f35aba624da8cf6ed4fb8a6fb"
        ),
        bytes.fromhex(
            "3d4017c3e843895a92b70aa74d1b7ebc9c982ccf2ec4968cc0cd55f12af4660c"
        ),
        bytes.fromhex("72"),
        bytes.fromhex(
            "92a009a9f0d4cab8720e820b5f642540a2b27b5416503f8fb3762223ebdb69da"
            "085ac1e43e15996e458f3613d0f11d8c387b2eaeb4302aeeb00d291612bb0c00"
        ),
    ),
    (
        bytes.fromhex(
            "c5aa8df43f9f837bedb7442f31dcb7b166d38535076f094b85ce3a2e0b4458f7"
        ),
        bytes.fromhex(
            "fc51cd8e6218a1a38da47ed00230f0580816ed13ba3303ac5deb911548908025"
        ),
        bytes.fromhex("af82"),
        bytes.fromhex(
            "6291d657deec24024827e69c3abe01a30ce548a284743a445e3680d7db5ac3ac"
            "18ff9b538d16f290ae67f760984dc6594a7c15e9716ed28dc027beceea1ec40a"
        ),
    ),
]


def test_rfc8032_tests_1_2_3_batched():
    """All three §7.1 vectors through one batched sign + verify call
    (reference ed25519.rs:295-313 rfc8032_vectors)."""
    sks = [v[0] for v in RFC_VECTORS]
    pks = [v[1] for v in RFC_VECTORS]
    msgs = [v[2] for v in RFC_VECTORS]
    sigs = [v[3] for v in RFC_VECTORS]
    assert ped.public_keys_host(sks) == pks
    assert ped.sign_host(sks, msgs) == sigs
    assert ped.verify_host(pks, msgs, sigs) == [True, True, True]


def test_message_length_sweep():
    """Sign + verify messages of every length 0..40 plus a few larger
    sizes through one batched call (reference ed25519.rs:347-361 signs a
    length sweep and verifies each; here the whole sweep is one batch —
    variable lengths are a host-side SHA-512 concern only, the device
    kernel always sees fixed 64-byte digests)."""
    rng = random.Random(99)
    lengths = list(range(41)) + [63, 64, 65, 127, 128, 300]
    sk = bytes(rng.randrange(256) for _ in range(32))
    pk = orc.public_key(sk)
    msgs = [bytes(rng.randrange(256) for _ in range(n)) for n in lengths]
    sigs = ped.sign_host([sk] * len(msgs), msgs)
    assert sigs == [orc.sign(sk, m) for m in msgs]
    assert ped.verify_host([pk] * len(msgs), msgs, sigs) == (
        [True] * len(msgs)
    )
    # each signature only verifies its own message length/content
    rot = sigs[1:] + sigs[:1]
    assert ped.verify_host([pk] * len(msgs), msgs, rot) == (
        [False] * len(msgs)
    )
