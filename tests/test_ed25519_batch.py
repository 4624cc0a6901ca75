"""RLC batch verification vs the per-signature path and the oracle.

Covers the VERDICT round-3 contract: an all-valid batch accepts; a single
forged signature in the batch is caught by the RLC check and isolated via
the per-signature fallback."""

import random

import numpy as np
import pytest

from eccoxide_tpu.oracle import ed25519 as orc
from eccoxide_tpu.protocol import ed25519_batch as eb


def _make_batch(B, seed=99):
    rng = random.Random(seed)
    sks = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(B)]
    msgs = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 48)))
            for _ in range(B)]
    pks = [orc.public_key(sk) for sk in sks]
    sigs = [orc.sign(sk, m) for sk, m in zip(sks, msgs)]
    return pks, msgs, sigs


def test_rlc_accepts_valid_batch():
    pks, msgs, sigs = _make_batch(16)
    out = eb.verify_batch_host(pks, msgs, sigs,
                               rng=np.random.default_rng(1))
    assert out == [True] * 16


def test_rlc_rejects_and_isolates_forgery():
    pks, msgs, sigs = _make_batch(16, seed=7)
    bad = 11
    forged = bytearray(sigs[bad])
    forged[40] ^= 0x5A  # corrupt S
    sigs = sigs[:bad] + [bytes(forged)] + sigs[bad + 1:]
    out = eb.verify_batch_host(pks, msgs, sigs,
                               rng=np.random.default_rng(2))
    assert out == [i != bad for i in range(16)]


def test_rlc_rejects_wrong_message():
    pks, msgs, sigs = _make_batch(16, seed=13)
    msgs = msgs[:3] + [msgs[3] + b"x"] + msgs[4:]
    out = eb.verify_batch_host(pks, msgs, sigs,
                               rng=np.random.default_rng(3))
    assert out == [i != 3 for i in range(16)]


def test_rlc_rejects_noncanonical_encoding():
    """A pk encoding >= p must fail the whole-batch input gate and then
    be isolated by the fallback (same rejection verify_core applies)."""
    pks, msgs, sigs = _make_batch(16, seed=21)
    bad_pk = bytes([0xFF] * 31 + [0x7F])  # y = 2^255-1 - ... >= p
    pks = pks[:1] + [bad_pk] + pks[2:]
    out = eb.verify_batch_host(pks, msgs, sigs,
                               rng=np.random.default_rng(4))
    assert out[1] is False
    assert out[0] and all(out[2:])
