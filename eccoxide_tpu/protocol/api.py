"""Ergonomic single-key API mirroring the reference's protocol types.

The reference exposes per-protocol SecretKey / PublicKey / SharedSecret /
Keypair wrappers (/root/reference/src/protocol/x25519.rs:53-104,
ed25519.rs:145-243, x448.rs:51-102). This module provides the same
surface on top of the batched engines — single keys are just batch-1
columns. For throughput, use the batched functions directly.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import x25519 as _x25519
from . import x448 as _x448
from . import ed25519 as _ed25519


# ---------------------------------------------------------------------------
# X25519 (reference x25519.rs:53-104)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class X25519SharedSecret:
    bytes: "bytes"

    def was_contributory(self) -> bool:
        """False when the peer point was low-order (x25519.rs:99-103)."""
        return self.bytes != b"\x00" * 32


@dataclass(frozen=True)
class X25519PublicKey:
    bytes: "bytes"


@dataclass(frozen=True)
class X25519SecretKey:
    bytes: "bytes"

    def public_key(self) -> X25519PublicKey:
        return X25519PublicKey(_x25519.x25519_base_host(self.bytes))

    def exchange(self, peer: X25519PublicKey) -> X25519SharedSecret:
        return X25519SharedSecret(_x25519.x25519_host(self.bytes, peer.bytes))


# ---------------------------------------------------------------------------
# X448 (reference x448.rs:51-102)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class X448SharedSecret:
    bytes: "bytes"

    def was_contributory(self) -> bool:
        return self.bytes != b"\x00" * 56


@dataclass(frozen=True)
class X448PublicKey:
    bytes: "bytes"


@dataclass(frozen=True)
class X448SecretKey:
    bytes: "bytes"

    def public_key(self) -> X448PublicKey:
        return X448PublicKey(_x448.x448_base_host(self.bytes))

    def exchange(self, peer: X448PublicKey) -> X448SharedSecret:
        return X448SharedSecret(_x448.x448_host(self.bytes, peer.bytes))


# ---------------------------------------------------------------------------
# Ed25519 (reference ed25519.rs:145-243)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Ed25519PublicKey:
    bytes: "bytes"

    def verify(self, message: bytes, signature: bytes) -> bool:
        return _ed25519.verify_host(
            [self.bytes], [message], [signature]
        )[0]


@dataclass(frozen=True)
class Ed25519SecretKey:
    bytes: "bytes"

    def public_key(self) -> Ed25519PublicKey:
        return Ed25519PublicKey(_ed25519.public_keys_host([self.bytes])[0])

    def sign(self, message: bytes) -> bytes:
        return _ed25519.sign_host([self.bytes], [message])[0]


class Ed25519Keypair:
    """Caches the expanded scalar + public key like the reference's Keypair
    (ed25519.rs:162-243) so repeated signing skips re-derivation."""

    def __init__(self, secret: bytes):
        self.secret = secret
        a, prefixes = _ed25519.expand_secret_host([secret])
        self._a = a
        self._prefix = prefixes[0]
        self.public = Ed25519PublicKey(
            _ed25519.public_keys_host([secret])[0]
        )

    def sign(self, message: bytes) -> bytes:
        # cached fast path: no secret re-expansion, no pk re-derivation
        return _ed25519.sign_with_expanded_host(
            self._a, [self._prefix], [self.public.bytes], [message]
        )[0]

    def verify(self, message: bytes, signature: bytes) -> bool:
        return self.public.verify(message, signature)
