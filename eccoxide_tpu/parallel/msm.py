"""Pippenger multi-scalar multiplication, batched and mesh-sharded.

New subsystem with no reference counterpart (the reference is one-at-a-time
scalar multiplication; SURVEY.md §2c). What the reference contributes is the
correctness scaffold: complete addition formulas make arbitrary reduction
orderings and identity padding safe (/root/reference/src/curve/
projective.rs:953-966) — which is exactly what the data-parallel bucket
reduction below relies on.

Algorithm per window (width c):
  1. digit extraction (public scalars — MSM inputs are public in the ZK /
     batch-verification settings this serves; sorting is allowed)
  2. sort points by digit, segmented prefix-sum with the group law via
     jax.lax.associative_scan (log2(B) batched point-add rounds)
  3. scatter segment totals into 2^c buckets (empty buckets -> identity)
  4. bucket-weighted sum  sum_j j*B_j  via a reverse associative scan over
     the bucket axis + a binary tree reduction
Window results fold with a Horner pass (c doublings + 1 add per window).

Multi-device: points/scalars are sharded along the batch axis; each shard
computes its own per-window sums, which are combined with log-tree
point-additions after an all_gather over the mesh axis (bucket sums are
points — they reduce with the group law, not psum).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding


def _tree_reduce_points(group, pts, axis_size: int):
    """Fold a leading point-batch axis of size axis_size (power of 2 padded
    with identity) using the complete group law."""
    size = 1
    while size < axis_size:
        size *= 2
    if size != axis_size:
        ident = group.identity((size - axis_size,))
        pts = jax.tree.map(
            lambda a, i: jnp.concatenate([a, i], axis=-1), pts, ident
        )
    while size > 1:
        half = size // 2
        lo = jax.tree.map(lambda a: a[..., :half], pts)
        hi = jax.tree.map(lambda a: a[..., half : 2 * half], pts)
        pts = group.add(lo, hi)
        size = half
    return pts


def _segmented_scan_add(group, pts, seg_start):
    """Inclusive segmented prefix-sum of points along the batch axis."""

    def combine(a, b):
        pa, fa = a
        pb, fb = b
        p = group.select(fb[0] != 0, pb, group.add(pa, pb))
        return p, jnp.where(jnp.logical_or(fa != 0, fb != 0), 1, 0).astype(
            jnp.int32
        )

    # flags kept 2-D so every leaf shares the same scanned (last) axis rank
    flags = seg_start.astype(jnp.int32)[None]
    out, _ = jax.lax.associative_scan(combine, (pts, flags), axis=-1)
    return out


def _window_digits(scalar_bytes, c: int, n_windows: int):
    """(nbytes, B) LE bytes -> list of (B,) digit arrays, LSB window first."""
    assert 8 % c == 0 or c in (4, 8), "window width must divide a byte"
    digs = []
    for w in range(n_windows):
        bit = w * c
        q, r = divmod(bit, 8)
        if q >= scalar_bytes.shape[0]:
            digs.append(jnp.zeros_like(scalar_bytes[0]))
            continue
        v = scalar_bytes[q] >> r
        got = 8 - r
        k = 1
        while got < c and q + k < scalar_bytes.shape[0]:
            v = v | (scalar_bytes[q + k] << got)
            got += 8
            k += 1
        digs.append(v & ((1 << c) - 1))
    return digs


def _horner_fold(group, ws, n_windows: int, c: int):
    """Fold per-window sums: acc = [2^c]acc + S_w from the top window down
    (scan-driven for a compact graph)."""
    # xs: windows ordered top-first, each leaf (n, 1) -> stacked (nw, n, 1)
    xs = jax.tree.map(
        lambda a: jnp.moveaxis(a, -1, 0)[::-1][..., None], ws
    )

    def body(acc, wpt):
        for _ in range(c):
            acc = group.double(acc)
        return group.add(acc, wpt), None

    ident = group.identity((1,))
    ref = jax.tree.leaves(xs)[0][0] * 0
    acc = jax.tree.map(lambda a: a + ref, ident)
    acc, _ = jax.lax.scan(body, acc, xs)
    return acc


def msm_local(group, pts, scalar_bytes, c: int = 8):
    """Single-shard Pippenger MSM. pts: point pytree with trailing batch
    axis B; scalar_bytes: (nbytes, B) LE. Returns the point
    sum_i [s_i] P_i (batch size 1)."""
    nbits = scalar_bytes.shape[0] * 8
    n_windows = -(-nbits // c)
    digits = _window_digits(scalar_bytes, c, n_windows)
    ws = msm_local_window_sums(group, pts, digits, c)
    return _horner_fold(group, ws, n_windows, c)


def make_sharded_msm(group, mesh: Mesh, c: int = 8, axis: str = "dp"):
    """Sharded MSM: batch axis split over the mesh; per-shard window sums
    are all-gathered and tree-folded with the group law."""

    def _shard_fn(pts, scalars):
        B = scalars.shape[1]
        nbits = scalars.shape[0] * 8
        n_windows = -(-nbits // c)
        digits = _window_digits(scalars, c, n_windows)
        # local per-window weighted sums, batched as a (n_windows,) axis
        local = msm_local_window_sums(group, pts, digits, c)
        # combine across shards: gather then fold
        gathered = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis, axis=0), local
        )  # (D, n, n_windows)
        D = jax.lax.axis_size(axis)

        def fold(i, acc):
            cur = jax.tree.map(lambda a: a[i], gathered)
            return group.add(acc, cur)

        ident = group.identity((n_windows,))
        ref = jax.tree.leaves(gathered)[0][0] * 0
        acc = jax.tree.map(lambda c_: c_ + ref, ident)
        acc = jax.lax.fori_loop(0, D, fold, acc)
        return _horner_fold(group, acc, n_windows, c)

    pspec = P(None, axis)

    # after the all_gather every shard folds identical data, so the output
    # really is replicated; the varying-axes checker can't infer that
    # through the group-law fold, hence check_vma=False
    fn = jax.shard_map(
        _shard_fn,
        mesh=mesh,
        in_specs=(pspec, pspec),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def msm_local_window_sums(group, pts, digits, c: int):
    """Per-window weighted bucket sums as a point batch of width
    len(digits) (helper shared by local and sharded MSM). The window loop
    is a lax.scan: every window does identical work."""
    nbuckets = 1 << c

    def one_window(carry, d):
        order = jnp.argsort(d)
        ds = d[order]
        p_s = jax.tree.map(lambda a: a[..., order], pts)
        prev = jnp.concatenate([jnp.full((1,), -1, ds.dtype), ds[:-1]])
        seg_start = ds != prev
        prefix = _segmented_scan_add(group, p_s, seg_start)
        nxt = jnp.concatenate([ds[1:], jnp.full((1,), -1, ds.dtype)])
        seg_end = (ds != nxt).astype(jnp.int32)
        mask = seg_end[None, :]
        buckets = jax.tree.map(
            lambda a: jnp.zeros(a.shape[:-1] + (nbuckets,), a.dtype)
            .at[..., ds]
            .add(a * mask),
            prefix,
        )
        occupied = (
            jnp.zeros((nbuckets,), jnp.int32).at[ds].add(seg_end) > 0
        )
        ident = group.identity((nbuckets,))
        buckets = group.select(occupied, buckets, ident)
        buckets = jax.tree.map(lambda a: a[..., 1:], buckets)
        csum = jax.lax.associative_scan(
            lambda a, b: group.add(a, b),
            jax.tree.map(lambda a: a[..., ::-1], buckets),
            axis=-1,
        )
        total = _tree_reduce_points(group, csum, nbuckets - 1)
        return carry, total

    digits_arr = jnp.stack(digits)  # (nw, B)
    _, sums = jax.lax.scan(one_window, 0, digits_arr)
    # sums leaves: (nw, n, 1) -> (n, nw)
    return jax.tree.map(lambda a: jnp.moveaxis(a[..., 0], 0, -1), sums)


def msm_sharded_example(mesh: Mesh):
    """Tiny end-to-end sharded MSM used by the multichip dry run."""
    from ..curves import sec2
    from ..oracle.curve import WCurve
    from ..params.sec2_params import CURVES

    name = "p192k1"
    spec = sec2.get_curve(name)
    c = CURVES[name]
    o = WCurve(c["p"], c["a"] % c["p"], c["b"], c["gx"], c["gy"], c["order"])

    import random

    rng = random.Random(5)
    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    B = 2 * D
    ks = [rng.randrange(1, o.order) for _ in range(B)]
    base_pts = [o.mul_base(rng.randrange(1, o.order)) for _ in range(B)]
    f = spec.field
    X = f.encode_ints([pt[0] for pt in base_pts])
    Y = f.encode_ints([pt[1] for pt in base_pts])
    pts = spec.from_affine(X, Y)
    nb = spec.scalar.n_bytes
    sc = np.zeros((nb, B), dtype=np.int32)
    for j, k in enumerate(ks):
        for i, by in enumerate(k.to_bytes(nb, "little")):
            sc[i, j] = by
    axis = mesh.axis_names[0]
    msm = make_sharded_msm(spec, mesh, c=4, axis=axis)
    pts_sh = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(None, axis))), pts
    )
    sc_sh = jax.device_put(jnp.asarray(sc), NamedSharding(mesh, P(None, axis)))
    out = msm(pts_sh, sc_sh)
    ax, ay = spec.to_affine(out)
    gx = spec.field.decode_ints(ax)[0]
    gy = spec.field.decode_ints(ay)[0]
    # oracle expected value
    exp = None
    for k, pt in zip(ks, base_pts):
        exp = o.add(exp, o.mul(k, pt))
    assert (gx, gy) == exp, "sharded MSM mismatch"
    return True
