"""Sequence-parallel banded attention: shard_map + ppermute halo ring.

Long-context capability (SURVEY.md §5.7 — absent in the single-GPU
reference; this is the TPU-native design it sketches): the sequence axis
is sharded over the mesh, and because banded attention only needs each
query block's ±1 neighbor key/value blocks, the cross-shard dependency is
exactly one window-sized block per direction. Each device `ppermute`s its
first K/V block to its left neighbor and its last to its right neighbor
(one ICI hop each), then runs the same blockwise dense-MXU band kernel as
tpusparse.nn.LocalAttention on its local blocks. Compute and memory per
device are O(s/P · window · d); communication is O(window · d).

Numerically identical to the unsharded LocalAttention (same masks,
positions computed globally from the shard index).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpusparse.parallel.mesh import shard_map


from tpusparse.nn.attention import banded_blocks as _banded_blocks


def ring_local_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window: int,
    mesh: Mesh,
    axis: str = "seq",
) -> jnp.ndarray:
    """Banded attention with the sequence axis sharded over `axis`.

    q/k/v: (batch, heads, seq, head_dim) global arrays; seq must divide
    into window-sized blocks distributed evenly over the axis. Returns
    the (batch, heads, seq, head_dim) context, sharded the same way.
    """
    b, h, s, hd = q.shape
    B = window
    nshards = mesh.shape[axis]
    if s % (B * nshards) != 0:
        raise ValueError(
            f"seq {s} must divide into window {B} blocks over {nshards} shards"
        )
    nb_local = s // B // nshards
    perm_fwd = [(i, (i + 1) % nshards) for i in range(nshards)]
    perm_bwd = [(i, (i - 1) % nshards) for i in range(nshards)]

    def body(qs, ks, vs):
        # local shapes: (b, h, s_local, hd)
        idx = lax.axis_index(axis)
        def blocks(x):
            return x.reshape(b, h, nb_local, B, hd)

        qb, kb, vb = blocks(qs), blocks(ks), blocks(vs)
        # halo exchange: my last block -> right neighbor's left halo,
        # my first block -> left neighbor's right halo (one ICI hop each).
        # Wrapped blocks at the ring boundary carry wrong positions and
        # are masked out by the global in_range test.
        k_left = lax.ppermute(kb[:, :, -1], axis, perm_fwd)
        v_left = lax.ppermute(vb[:, :, -1], axis, perm_fwd)
        k_right = lax.ppermute(kb[:, :, 0], axis, perm_bwd)
        v_right = lax.ppermute(vb[:, :, 0], axis, perm_bwd)
        k_pad = jnp.concatenate(
            [k_left[:, :, None], kb, k_right[:, :, None]], axis=2
        )
        v_pad = jnp.concatenate(
            [v_left[:, :, None], vb, v_right[:, :, None]], axis=2
        )
        ctx = _banded_blocks(qb, k_pad, v_pad, B, idx * nb_local, s)
        return ctx.reshape(b, h, nb_local * B, hd)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3,
        out_specs=P(None, None, axis, None),
    )(q, k, v)


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "seq",
    mask: jnp.ndarray | None = None,
    fused: bool = False,
    causal: bool = False,
) -> jnp.ndarray:
    """Full (dense) attention with sequence-parallel inputs via the
    Ulysses reshard: inputs arrive sharded on the sequence axis; an
    all_to_all trades the sequence shard for a head shard, so each device
    runs unmodified full-sequence attention over heads/P local heads,
    and a second all_to_all restores sequence sharding. Communication is
    2 all_to_alls of the activations; attention math is untouched (exact,
    any mask) — the complement of ring_local_attention, which shards the
    banded kernel itself.

    q/k/v: (batch, heads, seq, head_dim); heads must divide the axis size.
    """
    b, h, s, hd = q.shape
    nshards = mesh.shape[axis]
    if h % nshards != 0 or s % nshards != 0:
        raise ValueError(
            f"heads {h} and seq {s} must divide the '{axis}' axis ({nshards})"
        )

    # a mask with a full heads dimension must follow the head reshard: the
    # local scores are (b, h/P, s, s), so the mask's head slice for THIS
    # device's heads is selected inside the body (applying the full-heads
    # mask directly would broadcast wrongly or crash). Head-free masks
    # (broadcastable over heads) replicate unchanged.
    per_head_mask = (
        mask is not None and mask.ndim == 4 and mask.shape[1] == h
    )

    def body(qs, ks, vs):
        # local: (b, h, s/P, hd) -> all_to_all -> (b, h/P, s, hd)
        def scatter_heads(x):
            return lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)

        def gather_seq(x):
            return lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)

        qh, kh, vh = scatter_heads(qs), scatter_heads(ks), scatter_heads(vs)
        local_mask = mask
        if per_head_mask:
            h_local = h // nshards
            local_mask = lax.dynamic_slice_in_dim(
                mask, lax.axis_index(axis) * h_local, h_local, axis=1
            )
        if fused:
            # each device holds FULL sequences for its local heads, so the
            # single-chip fused flash kernel (and its fused backward)
            # applies unchanged — Ulysses reshard + flash compute
            from tpusparse.kernels.flash_attention import flash_attention_diff

            if mask is not None:
                raise ValueError("fused ulysses supports causal masks only")
            ctx = flash_attention_diff(qh, kh, vh, causal, None)
            return gather_seq(ctx)
        from tpusparse.dense import einsum as precise_einsum

        scores = precise_einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
        if causal:
            cm = jnp.tril(jnp.ones((s, s), bool))
            scores = jnp.where(cm, scores, -1e9)
        if local_mask is not None:
            scores = jnp.where(local_mask, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = precise_einsum("bhqk,bhkd->bhqd", probs, vh)
        return gather_seq(ctx)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3,
        out_specs=P(None, None, axis, None),
    )(q, k, v)


# -----------------------------------------------------------------------------
# Ring flash attention — FULL attention with the sequence axis sharded.
# -----------------------------------------------------------------------------


def _merge_partial(o1, lse1, o2, lse2):
    """Combine two normalized partial attentions via their logsumexps."""
    lse = jnp.logaddexp(lse1, lse2)
    w1 = jnp.exp(lse1 - lse)[..., None]
    w2 = jnp.exp(lse2 - lse)[..., None]
    return o1 * w1 + o2 * w2, lse


def ring_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "seq",
    causal: bool = False,
) -> jnp.ndarray:
    """Full (dense) flash attention with the sequence axis sharded.

    The complement of `ulysses_attention` that never materializes the
    full sequence anywhere: each device keeps its Q shard and rotates the
    K/V shards around the ring (one `ppermute` hop per step), running the
    fused flash kernel per chunk and merging the normalized partials with
    their logsumexps. Communication per step is one K/V shard on ICI,
    overlapped with the chunk's kernel work by XLA's async
    collective-permute.

    Backward is ring-shaped too: dq accumulates locally across chunks
    (each chunk call recomputes its score tile from the saved global
    logsumexp, exactly like the single-chip fused backward), while dk/dv
    partial sums rotate along with their K/V chunks so each lands back on
    its owner after P hops — O(seq/P) memory per device end-to-end.

    q/k/v: (batch, heads, seq, head_dim) global arrays. `causal=True`
    plumbs each chunk's GLOBAL positions into the kernel's masking via
    its scalar-prefetched offsets (chunks entirely in the future
    contribute nothing and are skipped tile-wise inside the kernel).
    """
    from tpusparse.kernels.flash_attention import (
        flash_attention,
        flash_attention_bwd,
    )

    b, h, s, hd = q.shape
    nshards = mesh.shape[axis]
    if s % nshards != 0:
        raise ValueError(f"seq {s} must divide the '{axis}' axis ({nshards})")
    perm = [(i, (i + 1) % nshards) for i in range(nshards)]

    @jax.custom_vjp
    def _ring(qs, ks, vs):
        o, lse = _ring_fwd_inner(qs, ks, vs)
        # the logsumexp merge promotes partials to f32; match the
        # single-chip kernel's contract (output dtype == q.dtype) so the
        # result does not depend on the mesh size
        return o.astype(qs.dtype)

    def _offsets(qs, t):
        idx = lax.axis_index(axis)
        sl = qs.shape[2]
        src = lax.rem(idx - t + nshards, nshards)  # chunk owner at step t
        return idx * sl, src * sl

    def _ring_fwd_inner(qs, ks, vs):
        qoff, kvoff = _offsets(qs, 0)
        o, lse = flash_attention(
            qs, ks, vs, causal=causal, return_lse=True,
            q_offset=qoff, kv_offset=kvoff,
        )
        kc, vc = ks, vs
        for t in range(1, nshards):
            kc = lax.ppermute(kc, axis, perm)
            vc = lax.ppermute(vc, axis, perm)
            qoff, kvoff = _offsets(qs, t)
            o_t, lse_t = flash_attention(
                qs, kc, vc, causal=causal, return_lse=True,
                q_offset=qoff, kv_offset=kvoff,
            )
            o, lse = _merge_partial(o, lse, o_t, lse_t)
        return o, lse

    def _ring_vjp_fwd(qs, ks, vs):
        o, lse = _ring_fwd_inner(qs, ks, vs)
        o = o.astype(qs.dtype)
        return o, (qs, ks, vs, o, lse)

    def _ring_vjp_bwd(res, g):
        qs, ks, vs, o, lse = res
        dq = jnp.zeros_like(qs)
        kc, vc = ks, vs
        dk_acc = jnp.zeros_like(ks)
        dv_acc = jnp.zeros_like(vs)
        for t in range(nshards):
            if t:
                kc = lax.ppermute(kc, axis, perm)
                vc = lax.ppermute(vc, axis, perm)
                dk_acc = lax.ppermute(dk_acc, axis, perm)
                dv_acc = lax.ppermute(dv_acc, axis, perm)
            qoff, kvoff = _offsets(qs, t)
            dq_t, dk_t, dv_t = flash_attention_bwd(
                qs, kc, vc, o, lse, g,
                causal=causal, q_offset=qoff, kv_offset=kvoff,
            )
            dq = dq + dq_t
            dk_acc = dk_acc + dk_t
            dv_acc = dv_acc + dv_t
        # one more hop completes the cycle: accumulators return to owners
        dk_acc = lax.ppermute(dk_acc, axis, perm)
        dv_acc = lax.ppermute(dv_acc, axis, perm)
        return dq, dk_acc, dv_acc

    _ring.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)

    return shard_map(
        _ring,
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3,
        out_specs=P(None, None, axis, None),
    )(q, k, v)
