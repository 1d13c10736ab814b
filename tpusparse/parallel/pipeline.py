"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

New capability beyond the single-GPU reference: layer stages live on
different devices of a 'stage' mesh axis, activations flow stage-to-stage
over ICI via `ppermute`, and microbatches keep every stage busy after the
fill phase (utilization M/(M+S-1) for M microbatches, S stages).

Implementation is the standard JAX SPMD-pipeline idiom: one shard_map
body runs on every stage in lockstep for M+S-1 ticks; stage 0 injects
microbatch t, stage s>0 consumes its left neighbor's tick-(t-1) output,
and the last stage accumulates results (psum'd out so the caller sees a
replicated output). Stages must share one activation width so the
rotating buffer keeps a static shape.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpusparse.parallel.mesh import shard_map


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "stage",
    num_microbatches: int = 4,
) -> jnp.ndarray:
    """Run `stage_fn(params_s, h) -> h` as an S-stage pipeline.

    stage_params: pytree whose leaves have a leading stage axis of size S
    (sharded over `axis`, one stage's slice per device). x: (batch, d);
    batch must divide into num_microbatches. The activation width d must
    be preserved by every stage. Returns (batch, d), replicated.
    """
    S = mesh.shape[axis]
    M = num_microbatches
    batch, d = x.shape
    if batch % M != 0:
        raise ValueError(f"batch {batch} must divide microbatches {M}")
    mb = batch // M
    xs = x.reshape(M, mb, d)
    perm = [(i, (i + 1) % S) for i in range(S)]

    def body(params_l, xs_l):
        # params_l leaves: (1, ...) — this stage's slice
        params_s = jax.tree_util.tree_map(lambda p: p[0], params_l)
        s = lax.axis_index(axis)
        state = jnp.zeros((mb, d), x.dtype)
        out_acc = jnp.zeros((M, mb, d), x.dtype)

        def tick(t, carry):
            state, out_acc = carry
            inject = xs_l[jnp.clip(t, 0, M - 1)]
            h_in = jnp.where(s == 0, inject, state)
            h_out = stage_fn(params_s, h_in)
            m = t - (S - 1)
            valid = (s == S - 1) & (m >= 0) & (m < M)
            mc = jnp.clip(m, 0, M - 1)
            out_acc = out_acc.at[mc].set(
                jnp.where(valid, h_out, out_acc[mc])
            )
            state = lax.ppermute(h_out, axis, perm)
            return state, out_acc

        _, out_acc = lax.fori_loop(0, M + S - 1, tick, (state, out_acc))
        # only the last stage holds real outputs; replicate via psum of
        # the masked accumulator (zeros elsewhere)
        out_acc = jnp.where(s == S - 1, out_acc, jnp.zeros_like(out_acc))
        return lax.psum(out_acc, axis)

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(axis), stage_params),
            P(),
        ),
        out_specs=P(),
    )(stage_params, xs)
    return out.reshape(batch, d)
