"""Ed25519 random-linear-combination (RLC) batch verification.

Instead of B independent Straus chains (ed25519.verify_core — 256 doubles
per signature, ~40% of the per-signature phase budget), a batch is checked
with ONE equation:

    sum_i z_i*S_i * B  -  sum_i (z_i*k_i) * A_i  -  sum_i z_i * R_i  ==  0

with fresh uniform random nonzero 128-bit z_i.  If every signature is
valid the sum is the identity; if any is invalid the check fails except
with probability <= 2^-128 over the z_i (the standard batch-verification
argument).  The two variable-base sums run as Pippenger MSMs
(parallel/msm.py — the doubling chains amortize across the whole batch:
per window the sorted segmented scan costs ~2 additions per point versus
~8 doublings + adds per Straus step), and the fixed-base term is one comb
scalar-mul of the batch-folded scalar sum.

Semantics versus the reference's one-at-a-time verify
(/root/reference/src/protocol/ed25519.rs:116-143): acceptance implies
every signature passes verify_core (w.h.p.); on rejection the host
wrapper isolates failures with the per-signature path, so the *observable*
accept/reject behavior per signature is identical.  Correctness of the
MSM reductions (arbitrary orders, identity padding, duplicate points)
rests on the complete addition formulas (reference
projective.rs:953-966).

All inputs here are public (signatures, public keys, digests), so the
vartime gather-based MSM is safe — the same reasoning as verify_core's
public-input Straus path (ed25519.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..curves import curve25519 as c255
from ..parallel.msm import msm_local
from . import ed25519 as base

FL = c255.FL
FQ = c255.FQ
ED = c255.EDWARDS

Z_BYTES = 16  # 128-bit randomizers


def _fold_sum_scalar(x):
    """Sum a (n, B) batch of scalar-field elements over the batch axis
    with a halving tree of FL.add calls (log2(B) adds, each full-width)."""
    B = x.shape[1]
    while B > 1:
        h = (B + 1) // 2
        lo = x[:, :h]
        hi = x[:, h:]
        if hi.shape[1] < h:
            hi = jnp.pad(hi, ((0, 0), (0, h - hi.shape[1])))
        x = FL.add(lo, hi)
        B = h
    return x


def rlc_verify_core(pk_bytes, r_bytes, s_bytes, k_wide_bytes, z_bytes,
                    tables=None, msm_c: int = 8):
    """Device core: one bool for the whole batch.

    pk/r/s: (32, B) byte columns; k_wide: (64, B) H(R||A||M) bytes;
    z: (Z_BYTES, B) random nonzero byte columns; ``tables`` the CT comb
    triple (params/comb.py) as runtime arrays.  Returns True iff every
    encoding is canonical/decodable AND the RLC equation holds."""
    A, ok_a = ED.decompress(pk_bytes)
    R, ok_r = ED.decompress(r_bytes)
    s, ok_s = FL.from_bytes_le(s_bytes)
    k = FL.from_wide_bytes_le(k_wide_bytes)

    zpad = jnp.concatenate(
        [z_bytes, jnp.zeros((FL.n_bytes - Z_BYTES,) + z_bytes.shape[1:],
                            z_bytes.dtype)], axis=0)
    z, _ = FL.from_bytes_le(zpad)  # < 2^128 << l: always canonical

    zk_bytes = FL.to_bytes_le(FL.mul(z, k))
    c_bytes = FL.to_bytes_le(_fold_sum_scalar(FL.mul(z, s)))

    fixed = base.scalar_mul_base(c_bytes, tables)        # [sum z_i s_i] B
    m_a = msm_local(ED, ED.neg(A), zk_bytes, c=msm_c)    # -[sum z_i k_i A_i]
    m_r = msm_local(ED, ED.neg(R), z_bytes, c=msm_c)     # -[sum z_i R_i]

    total = ED.add(ED.add(fixed, m_a), m_r)
    f = FQ
    is_id = jnp.logical_and(
        f.is_zero(total.x), f.eq(total.y, total.z)
    )[0]
    ok_inputs = jnp.all(
        jnp.logical_and(jnp.logical_and(ok_a, ok_r), ok_s)
    )
    return jnp.logical_and(ok_inputs, is_id)


def sample_z(B: int, rng: np.random.Generator | None = None) -> np.ndarray:
    """(Z_BYTES, B) int32 nonzero random byte columns."""
    if rng is None:
        rng = np.random.default_rng()
    z = rng.integers(0, 256, size=(Z_BYTES, B), dtype=np.int64)
    # z_i == 0 (prob 2^-128) would void the soundness bound: force nonzero
    zero = (z == 0).all(axis=0)
    z[0] = np.where(zero, 1, z[0])
    return z.astype(np.int32)


def verify_batch_host(pks: list[bytes], msgs: list[bytes],
                      sigs: list[bytes], rng=None) -> list[bool]:
    """Batch verify; falls back to the per-signature path on rejection so
    callers still learn exactly which signatures failed."""
    B = len(pks)
    rs = [s[:32] for s in sigs]
    ss = [s[32:] for s in sigs]
    k_wide = base.sha512_batch_host(
        [r + pk + m for r, pk, m in zip(rs, pks, msgs)]
    )
    pkc, rc, sc = base._cols(pks), base._cols(rs), base._cols(ss)
    kwc = jnp.asarray(k_wide)
    z = jnp.asarray(sample_z(B, rng))
    # bucket count scales with batch: 2^c buckets only pay off once the
    # segment scan has ~2^c points per window to amortize them
    msm_c = 8 if B >= 4096 else 4
    from functools import partial

    ok = base._jit(f"rlc{msm_c}",
                   partial(rlc_verify_core, msm_c=msm_c))(
        pkc, rc, sc, kwc, z, base.device_tables()
    )
    if bool(np.asarray(ok)):
        return [True] * B
    # batch rejected: isolate with the per-signature path
    mask = base._jit("vc", base.verify_core)(
        pkc, rc, sc, kwc, base.device_tables_verify()
    )
    return [bool(v) for v in np.asarray(mask)]
