"""Expert parallelism: switch-style top-1 MoE with experts sharded over a
mesh axis.

New capability beyond the single-GPU reference: E expert FFNs live
distributed over the 'expert' axis (E/P per device). A learned router
assigns each token its top-1 expert; each device runs only its local
experts (on the full token batch, masked to the tokens routed there) and
a psum combines the shards. Gradients flow to the router through the
gate-probability scaling (the standard switch-transformer estimator).

This is the dense-dispatch formulation: compute per device is
(E/P)·tokens matmuls, exchanged for zero all_to_all traffic — the right
trade at small expert counts. A capacity-based all_to_all dispatch drops
in behind the same API when E is large.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpusparse.parallel.mesh import shard_map


def init_moe_params(key, num_experts: int, d_model: int, d_hidden: int):
    """(router (d, E), w_in (E, d, dh), w_out (E, dh, d)) with fan-in init."""
    k1, k2, k3 = jax.random.split(key, 3)
    s_in = 1.0 / np.sqrt(d_model)
    s_hid = 1.0 / np.sqrt(d_hidden)
    return {
        "router": jax.random.uniform(k1, (d_model, num_experts), minval=-s_in, maxval=s_in),
        "w_in": jax.random.uniform(
            k2, (num_experts, d_model, d_hidden), minval=-s_in, maxval=s_in
        ),
        "w_out": jax.random.uniform(
            k3, (num_experts, d_hidden, d_model), minval=-s_hid, maxval=s_hid
        ),
    }


def moe_forward_reference(params, x: jnp.ndarray) -> jnp.ndarray:
    """Unsharded oracle: top-1 routing, gate-scaled expert FFN."""
    logits = x @ params["router"]
    probs = jax.nn.softmax(logits, axis=-1)
    assign = jnp.argmax(probs, axis=-1)
    gate = jnp.take_along_axis(probs, assign[:, None], axis=1)[:, 0]
    E = params["w_in"].shape[0]
    out = jnp.zeros_like(x)
    for e in range(E):
        h = jax.nn.relu(x @ params["w_in"][e]) @ params["w_out"][e]
        out = out + jnp.where((assign == e)[:, None], h, 0.0)
    return out * gate[:, None]


def moe_forward(
    params, x: jnp.ndarray, mesh: Mesh, axis: str = "expert"
) -> jnp.ndarray:
    """Expert-parallel forward: experts sharded over `axis`, tokens
    replicated, outputs psum-combined. Matches moe_forward_reference."""
    E = params["w_in"].shape[0]
    nshards = mesh.shape[axis]
    if E % nshards != 0:
        raise ValueError(f"num_experts {E} must divide shards {nshards}")
    e_local = E // nshards

    # routing is cheap and data-parallel — compute it replicated
    logits = x @ params["router"]
    probs = jax.nn.softmax(logits, axis=-1)
    assign = jnp.argmax(probs, axis=-1)
    gate = jnp.take_along_axis(probs, assign[:, None], axis=1)[:, 0]

    def body(w_in_l, w_out_l, x_l, assign_l, gate_l):
        s = lax.axis_index(axis)
        out = jnp.zeros_like(x_l)
        for le in range(e_local):
            ge = s * e_local + le
            mask = (assign_l == ge)[:, None]
            h = jax.nn.relu(x_l @ w_in_l[le]) @ w_out_l[le]
            out = out + jnp.where(mask, h, 0.0)
        return lax.psum(out, axis)

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P()),
        out_specs=P(),
    )(params["w_in"], params["w_out"], x, assign, gate)
    return out * gate[:, None]


def moe_forward_a2a(
    params,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "expert",
    capacity_factor: float = 2.0,
) -> jnp.ndarray:
    """Capacity-based all_to_all expert dispatch — the large-E form.

    Same API and routing semantics as `moe_forward`, but tokens are
    sharded over `axis` and each token is SHIPPED to its expert's owner
    device instead of every device running every token: per shard, the
    top-1 assignments are packed into an (E, C, d) dispatch buffer
    (C = ceil(capacity_factor · T_local / E) slots per expert; tokens
    over capacity are dropped to zero output, the standard switch
    estimator), exchanged with one `lax.all_to_all`, run through the
    local experts, and returned by the reverse all_to_all. Compute per
    device is (E/P)·(P·C) rows instead of (E/P)·T_total — the right
    trade when E is large and routing is balanced. With
    capacity_factor ≥ E the dispatch is lossless and matches
    `moe_forward_reference` exactly (the parity test's setting).
    """
    E = params["w_in"].shape[0]
    d = x.shape[-1]
    nshards = mesh.shape[axis]
    if E % nshards != 0:
        raise ValueError(
            f"num_experts {E} must be divisible by the shard count {nshards}"
        )
    if x.shape[0] % nshards != 0:
        raise ValueError(
            f"token count {x.shape[0]} must be divisible by the shard "
            f"count {nshards}"
        )
    e_local = E // nshards
    t_local = x.shape[0] // nshards
    cap = int(np.ceil(capacity_factor * t_local / E))

    def body(w_in_l, w_out_l, router, x_l):
        logits = x_l @ router
        probs = jax.nn.softmax(logits, axis=-1)
        assign = jnp.argmax(probs, axis=-1)
        gate = jnp.take_along_axis(probs, assign[:, None], axis=1)[:, 0]

        # bucket position of each token within its expert (running count)
        onehot = jax.nn.one_hot(assign, E, dtype=jnp.int32)
        pos = jnp.take_along_axis(
            jnp.cumsum(onehot, axis=0) - 1, assign[:, None], axis=1
        )[:, 0]
        keep = pos < cap
        slot = jnp.where(keep, pos, cap - 1)

        # dispatch buffer: dropped tokens scatter zeros (add keeps the
        # collision at slot cap-1 harmless)
        disp = jnp.zeros((E, cap, d), x_l.dtype)
        disp = disp.at[assign, slot].add(
            jnp.where(keep[:, None], x_l, 0.0)
        )
        # ship each expert's bucket to its owner shard; received layout
        # is (source_shard, local_expert, cap, d)
        disp = disp.reshape(nshards, e_local, cap, d)
        recv = lax.all_to_all(disp, axis, split_axis=0, concat_axis=0)

        outs = []
        for le in range(e_local):
            tok = recv[:, le].reshape(nshards * cap, d)
            h = jax.nn.relu(tok @ w_in_l[le]) @ w_out_l[le]
            outs.append(h.reshape(nshards, cap, d))
        out_buf = jnp.stack(outs, axis=1)  # (source, e_local, cap, d)

        # return results to the token owners (exact reverse exchange)
        back = lax.all_to_all(out_buf, axis, split_axis=0, concat_axis=0)
        back = back.reshape(E, cap, d)
        y = back[assign, slot]
        return jnp.where(keep[:, None], y, 0.0) * gate[:, None]

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(axis)),
        out_specs=P(axis),
    )(params["w_in"], params["w_out"], params["router"], x)


def load_balance_loss(params, x: jnp.ndarray) -> jnp.ndarray:
    """Switch-transformer auxiliary loss: E · Σ_e f_e · p_e, where f_e is
    the fraction of tokens routed to expert e and p_e the mean router
    probability — minimized by uniform routing."""
    logits = x @ params["router"]
    probs = jax.nn.softmax(logits, axis=-1)
    E = probs.shape[-1]
    assign = jnp.argmax(probs, axis=-1)
    f = jnp.mean(jax.nn.one_hot(assign, E), axis=0)
    p = jnp.mean(probs, axis=0)
    return E * jnp.sum(f * p)
