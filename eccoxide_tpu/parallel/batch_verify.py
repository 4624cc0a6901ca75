"""Data-parallel batched verification over a device mesh.

The batch axis is the data-parallel axis (SURVEY.md §2c): every verify is
element-wise independent, so the mesh strategy is shard-the-batch +
all-reduce only the scalar accept/reject statistics. Collectives ride ICI
via jax.shard_map / psum; there is no reference counterpart to port — the
reference is single-threaded (src/curve/field.rs:29-30 is its entire
"parallelism").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..protocol import ed25519 as ped


def make_sharded_verify(mesh: Mesh, axis: str = "dp"):
    """Returns a jitted verifier over (32,B)/(32,B)/(32,B)/(64,B) byte
    columns with B sharded across ``axis``. Outputs the per-element mask
    (sharded) and the global accept count (replicated via psum). The comb
    tables are threaded as replicated runtime arguments (params/comb.py
    explains why they must not be embedded as constants)."""

    spec = P(None, axis)
    tspec = (P(), P(), P())

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, tspec),
        out_specs=(P(axis), P()),
    )
    def _verify(pk, r, s, kw, tables):
        ok = ped.verify_core(pk, r, s, kw, tables)
        count = jax.lax.psum(jnp.sum(ok.astype(jnp.int32)), axis)
        return ok, count

    jitted = jax.jit(_verify)

    def call(pk, r, s, kw):
        return jitted(pk, r, s, kw, ped.device_tables_verify())

    return call


def shard_batch(mesh: Mesh, arr, axis: str = "dp"):
    """Place a (rows, B) byte-column array with B sharded over the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(None, axis)))
