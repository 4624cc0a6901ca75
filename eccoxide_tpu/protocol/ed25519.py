"""Ed25519 (RFC 8032 PureEdDSA), batched.

TPU-native counterpart of /root/reference/src/protocol/ed25519.rs. Design
split: SHA-512 runs on the host via the native C++ threaded batch hasher
(ops/sha512.py; hashing is outside the reference's own metric too — it
delegates to cryptoxide, ed25519.rs:11-17), while all curve/scalar math
— wide reduction (ed25519.rs:21-23), fixed-base mul (curve25519.rs:775),
variable-base CT mul (curve25519.rs:676-687), point codec (ed25519.rs:
27-56) — runs batched on device.

Device-facing entry points take fixed-shape byte columns; host wrappers
handle Python bytes and hashing.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..curves import curve25519 as c255
from ..curves.edwards import ExtPoint

FQ = c255.FQ
FL = c255.FL
ED = c255.EDWARDS


def sha512_batch_host(msgs: list[bytes]) -> np.ndarray:
    """Host-side batched SHA-512 -> (64, B) int32 byte columns.

    Delegates to the native C++/threaded backend (ops/sha512.py, which
    itself falls back to per-message hashlib if the shared library cannot
    be built). Hashing is the host half of the pipeline — the reference
    likewise delegates to an external hash (ed25519.rs:11-17)."""
    from ..ops.sha512 import sha512_batch

    return sha512_batch(msgs)


def clamp_scalar_bytes(h: np.ndarray) -> np.ndarray:
    """RFC 8032 secret-scalar clamp on (32, B) byte columns
    (reference ed25519.rs:59-77 expand_secret)."""
    h = h.copy()
    h[0] &= 0xF8
    h[31] = (h[31] & 0x7F) | 0x40
    return h


def windows_from_bytes_le(by, n_windows: int):
    """(nbytes, B) LE bytes -> (n_windows, B) 4-bit digits, MSB first."""
    outs = []
    for j in range(n_windows):
        bit = 4 * (n_windows - 1 - j)
        q, r = divmod(bit, 8)
        outs.append((by[q] >> r) & 0xF)
    return jnp.stack(outs)


def scalar_mul_base(scalar_bytes, tables=None):
    """[s]B for (32, B) LE scalar bytes -> ExtPoint (comb fixed-base).

    ``tables`` is the comb (xs, ys, ts) triple threaded as runtime arrays
    (see params/comb.py module docstring); None embeds constants (CPU
    tests only)."""
    from ..params.comb import get_comb

    comb = get_comb("edwards25519")
    return comb.mul_base(scalar_bytes, tables)


def scalar_mul(point: ExtPoint, scalar_bytes):
    w = windows_from_bytes_le(scalar_bytes, 64)
    return ED.scalar_mul(point, w)


# ---------------------------------------------------------------------------
# device-side cores (jittable)
# ---------------------------------------------------------------------------


def sign_core(a_clamped_bytes, r_wide_bytes, k_wide_bytes):
    """Device part of signing, given the two SHA-512 digests.

    a_clamped: (32, B) clamped secret scalar bytes
    r_wide:    (64, B) H(prefix || M)
    k_wide:    (64, B) H(R || A || M)   [second pass; see sign_host]
    Returns S bytes (32, B). R must be computed by the first-pass call
    r_point_core. (reference ed25519.rs:91-107 sign_with_public)
    """
    r = FL.from_wide_bytes_le(r_wide_bytes)
    k = FL.from_wide_bytes_le(k_wide_bytes)
    a = _scalar_from_clamped(a_clamped_bytes)
    s = FL.add(r, FL.mul(k, a))
    return FL.to_bytes_le(s)


def _scalar_from_clamped(a_bytes):
    """Clamped scalar bytes -> FL element. The clamped value can be >= l,
    so reduce as a wide value rather than canonical from_bytes."""
    return FL.from_wide_bytes_le(a_bytes)


def r_point_core(r_wide_bytes, tables=None):
    """First device pass of signing: R = [r]B compressed (32, B)."""
    r = FL.from_wide_bytes_le(r_wide_bytes)
    r_bytes = FL.to_bytes_le(r)
    return ED.compress(scalar_mul_base(r_bytes, tables))


def public_key_core(a_clamped_bytes, tables=None):
    """A = [a]B compressed (32, B) (reference ed25519.rs:73-77)."""
    a = _scalar_from_clamped(a_clamped_bytes)
    return ED.compress(scalar_mul_base(FL.to_bytes_le(a), tables))


def verify_core(pk_bytes, r_bytes, s_bytes, k_wide_bytes, tables=None):
    """Device part of verification: checks [S]B - [k]A == R via a joint
    Straus/Shamir double-scalar multiplication (one shared doubling chain
    for both scalars — the reference's separate mul_base + scale
    (ed25519.rs:137-140) costs twice the doublings).

    ``tables`` is the 256-entry [k]B byte-table triple (params/comb.py
    edwards_byte_table) as runtime arrays; None embeds constants (CPU
    tests only).

    Returns a (B,) bool mask. Rejects non-canonical A/R encodings and
    non-canonical S (reference ed25519.rs:116-143)."""
    A, ok_a = ED.decompress(pk_bytes)
    R, ok_r = ED.decompress(r_bytes)
    _, ok_s = FL.from_bytes_le(s_bytes)  # canonical-S rejection only
    # S drives the comb windows as raw input bytes (canonical by the check
    # above; if not, ok_s already gates acceptance), and k goes straight
    # from the 64-byte digest to canonical bytes without the Montgomery
    # domain round-trip.
    k_bytes = FL.reduce_wide_bytes_le(k_wide_bytes)
    negA = ED.neg(A)
    lhs = double_scalar_mul_base(s_bytes, negA, k_bytes, tables)
    good = ED.eq(lhs, R)
    return jnp.logical_and(
        jnp.logical_and(ok_a, ok_r), jnp.logical_and(ok_s, good)
    )


def double_scalar_mul_base(s_bytes, Q, k_bytes, w8=None):
    """[s]B + [k]Q with one shared doubling chain (Straus interleaving):
    32 scan steps of (8 dbl + 1 mixed add + 2 adds + lookups).

    VERIFICATION-ONLY path: every input here is public (signature bytes,
    public key, message digest), so the reference's constant-time
    discipline does not apply and table lookups are data-dependent GATHERS
    rather than masked full-table scans (the same reasoning vartime
    verification uses everywhere, e.g. the reference's wNAF mul_vartime
    for public scalars, projective.rs:62-64). Secret-key paths
    (sign/public-key derivation) keep the CT comb (params/comb.py).

    Window layout: the Q scalar uses 4-bit MSB-first windows (16-entry
    per-element table, gathered); the fixed-base S scalar uses 8-bit
    windows served by ONE shared 256-entry [k]B affine table — with the
    MSB-first Horner chain (4 doublings per sub-step), a value added at
    sub-step t is scaled by 16^(63-t), so byte m of S folds in at
    t = 63-2m, i.e. on every second sub-step: 32 mixed adds total
    (half the adds of the 4-bit variant).

    ``w8`` is the (xs, ys, ts) byte-table triple
    (params/comb.py edwards_byte_table) as runtime arrays; None embeds
    constants (CPU tests only)."""
    from ..curves.edwards import ExtPoint

    batch = (s_bytes.shape[1],)
    wq = windows_from_bytes_le(k_bytes, 64)  # (64, B) MSB-first
    tableQ = ED._window_table(Q, 4)          # int16 coords

    f = FQ
    if w8 is None:
        from ..params.comb import edwards_byte_table

        w8 = edwards_byte_table()
    tx8, ty8, tt8 = (jnp.asarray(t) for t in w8)  # (256, n)
    # byte m of S folds in at sub-step t = 63-2m (odd t); scan step i
    # covers sub-steps 2i, 2i+1 -> byte 31-i at the second half
    sb_seq = jnp.stack([s_bytes[31 - i] for i in range(32)])  # (32, B)
    wq2 = wq.reshape(32, 2, -1)

    def gatherQ(idx):
        def pick(c):  # (16, n, B) int16 -> (n, B) int32
            return jnp.take_along_axis(
                c, idx[None, None, :].astype(jnp.int32), axis=0
            )[0].astype(jnp.int32)

        return ExtPoint(
            pick(tableQ.x), pick(tableQ.y), pick(tableQ.z), pick(tableQ.t)
        )

    def body(acc, xs):
        wq_pair, sb = xs
        accb = ED._unstack(acc)
        for i in range(4):
            accb = ED.double_b(accb, need_t=(i == 3))
        # Q-add T is never consumed (feeds doubles / the final T-free eq)
        accb = ED.add_b(accb, ED._unstack(gatherQ(wq_pair[0])), need_t=False)
        for i in range(4):
            accb = ED.double_b(accb, need_t=(i == 3))
        bx = jnp.take(tx8, sb, axis=0).T
        by = jnp.take(ty8, sb, axis=0).T
        bt = jnp.take(tt8, sb, axis=0).T
        accb = ED.add_mixed_b(
            accb, f.b_loose(bx), f.b_loose(by), f.b_loose(bt)
        )
        accb = ED.add_b(accb, ED._unstack(gatherQ(wq_pair[1])), need_t=False)
        return ED._stack(accb), None

    ident = ED.identity(batch)
    acc = ExtPoint(*(c + s_bytes[0] * 0 for c in ident))
    acc, _ = jax.lax.scan(body, acc, (wq2, sb_seq))
    return acc


# ---------------------------------------------------------------------------
# host API (hashing + orchestration); mirrors the reference's SecretKey /
# PublicKey / Keypair surface (ed25519.rs:145-243)
# ---------------------------------------------------------------------------

_jit_cache: dict = {}


def _jit(name, fn):
    if name not in _jit_cache:
        _jit_cache[name] = jax.jit(fn)
    return _jit_cache[name]


_dev_tables = None
_dev_tables_v = None


def device_tables():
    """CT comb tables (sign-side) staged once on the default device, to be
    passed as runtime arguments into the jitted cores (never embedded as
    constants — see params/comb.py)."""
    global _dev_tables
    if _dev_tables is None:
        from ..params.comb import get_comb

        comb = get_comb("edwards25519")
        _dev_tables = tuple(jax.device_put(t) for t in comb.tables())
    return _dev_tables


def device_tables_verify():
    """The 256-entry [k]B byte table (verify-side gather path), staged
    once on the default device."""
    global _dev_tables_v
    if _dev_tables_v is None:
        from ..params.comb import edwards_byte_table

        _dev_tables_v = tuple(
            jax.device_put(t) for t in edwards_byte_table()
        )
    return _dev_tables_v


def _cols(bs: list[bytes]) -> jnp.ndarray:
    return jnp.asarray(
        np.stack([np.frombuffer(b, np.uint8) for b in bs], axis=1).astype(np.int32)
    )


def _rows(arr) -> list[bytes]:
    a = np.asarray(arr)
    return [bytes(int(a[i, j]) & 0xFF for i in range(a.shape[0])) for j in range(a.shape[1])]


def expand_secret_host(sks: list[bytes]):
    """B secret keys -> (clamped scalar cols (32,B) np, prefixes list)."""
    h_cols = sha512_batch_host(sks)  # (64, B) int32
    a = h_cols[:32].copy()
    prefixes = [
        bytes(h_cols[32:, j].astype(np.uint8)) for j in range(h_cols.shape[1])
    ]
    return clamp_scalar_bytes(a), prefixes


def public_keys_host(sks: list[bytes]) -> list[bytes]:
    a, _ = expand_secret_host(sks)
    pk = _jit("pk", public_key_core)(jnp.asarray(a), device_tables())
    return _rows(pk)


def sign_with_expanded_host(a, prefixes, pks, msgs) -> list[bytes]:
    """Sign with pre-expanded secrets (the reference's cached-Keypair fast
    path, ed25519.rs:91-107 sign_with_public): a = clamped scalar cols
    (32, B), prefixes/pks as byte lists."""
    r_wide = sha512_batch_host([p + m for p, m in zip(prefixes, msgs)])
    R = _rows(_jit("rpt", r_point_core)(jnp.asarray(r_wide), device_tables()))
    k_wide = sha512_batch_host(
        [rb + pk + m for rb, pk, m in zip(R, pks, msgs)]
    )
    S = _rows(
        _jit("sc", sign_core)(
            jnp.asarray(a), jnp.asarray(r_wide), jnp.asarray(k_wide)
        )
    )
    return [rb + sb for rb, sb in zip(R, S)]


def sign_host(sks: list[bytes], msgs: list[bytes]) -> list[bytes]:
    assert len(sks) == len(msgs)
    a, prefixes = expand_secret_host(sks)
    pks = public_keys_host(sks)
    return sign_with_expanded_host(a, prefixes, pks, msgs)


def verify_host(pks: list[bytes], msgs: list[bytes], sigs: list[bytes]) -> list[bool]:
    rs = [s[:32] for s in sigs]
    ss = [s[32:] for s in sigs]
    k_wide = sha512_batch_host(
        [r + pk + m for r, pk, m in zip(rs, pks, msgs)]
    )
    ok = _jit("vc", verify_core)(
        _cols(pks), _cols(rs), _cols(ss), jnp.asarray(k_wide),
        device_tables_verify(),
    )
    return [bool(v) for v in np.asarray(ok)]
