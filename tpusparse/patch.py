"""Drop-in integration: route existing flax models through tpusparse ops.

TPU-native analog of the reference's monkey-patch deployment mode
(reference benchmarks/pytorch_linear.py: reassign `torch.nn.Linear` to the
custom `cublasLinear`; README.md:61-80: patch HF BERT's attention matmul
by hand). Instead of swapping layer classes wholesale, this exploits
flax's injection point: ``nn.Dense`` accepts a ``dot_general`` callable,
so a Dense subclass whose default ``dot_general`` is ours routes every
matmul of an *unmodified* model through the framework's custom_vjp ops —
autograd included, since the ops carry their own VJPs.

Two deployment styles:
  - `PatchedDense` — explicit: use in place of nn.Dense.
  - `patch_flax_dense()` — context manager that rebinds flax.linen.Dense
    (the reference's monkey-patch semantics); code constructing layers
    via `nn.Dense(...)` inside the context picks up the patched class.
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from tpusparse import ops


def tpusparse_dot_general(
    lhs: jnp.ndarray,
    rhs: jnp.ndarray,
    dimension_numbers: Tuple[Tuple[Sequence[int], Sequence[int]], Any],
    precision=None,
    preferred_element_type=None,
):
    """`lax.dot_general`-compatible entry routed through tpusparse ops.

    Handles the contraction pattern flax layers emit — last axis of lhs
    against axis 0 of a 2-D rhs, no batch dims (nn.Dense's
    ``(((ndim-1,), (0,)), ((), ()))``) — via the framework's dense mm op
    (flattening leading dims, the same routing the reference's
    `custom_matmul` does for 3-D×2-D, matmuls.py:43-48). Anything else
    falls back to lax.dot_general unchanged.
    """
    (lc, rc), (lb, rb) = dimension_numbers
    simple = (
        tuple(lc) == (lhs.ndim - 1,)
        and tuple(rc) == (0,)
        and not lb
        and not rb
        and rhs.ndim == 2
        and lhs.ndim >= 1
        and preferred_element_type in (None, lhs.dtype)
        # an explicit per-call precision must be honored — ops.mm runs at
        # the CONFIG precision, so routing would silently override the
        # caller's request (and make behavior shape-dependent, since the
        # fallback path below does honor it)
        and precision is None
    )
    if not simple:
        return lax.dot_general(
            lhs,
            rhs,
            dimension_numbers,
            precision=precision,
            preferred_element_type=preferred_element_type,
        )
    lead = lhs.shape[:-1]
    x2 = lhs.reshape(-1, lhs.shape[-1])
    y = ops.mm(x2, rhs)
    return y.reshape(*lead, rhs.shape[1])


class PatchedDense(nn.Dense):
    """nn.Dense whose matmul runs on tpusparse's mm op (with its VJP)."""

    dot_general: Any = tpusparse_dot_general


@contextlib.contextmanager
def patch_flax_dense(cls: type = PatchedDense):
    """Rebind flax.linen.Dense for the duration of the context.

    Mirrors the reference's `torch.nn.Linear = cublasLinear` deployment
    (benchmarks/pytorch_linear.py:1-3). Only affects code that constructs
    layers through the `flax.linen`/`flax.linen.linear` namespaces while
    the context is active; existing instances and `from ... import Dense`
    aliases taken earlier are untouched.
    """
    import flax.linen
    import flax.linen.linear

    originals = (flax.linen.Dense, flax.linen.linear.Dense)
    flax.linen.Dense = cls
    flax.linen.linear.Dense = cls
    try:
        yield cls
    finally:
        flax.linen.Dense, flax.linen.linear.Dense = originals


def sparsify_dense_params(
    params,
    path_patterns: Sequence[str],
    threshold: Optional[float] = None,
    density: Optional[float] = None,
):
    """Convert selected dense kernels in a params pytree to CSR weights.

    Deployment helper for moving a trained dense model onto the sparse
    path (the reference only ever trains sparse layers from scratch):
    kernels whose flattened path contains any of `path_patterns` are
    magnitude-pruned — keep |w| above `threshold`, or the top `density`
    fraction — and returned as a dict of `tpusparse.CSR` plus the pruned
    params tree (pruned entries zeroed in place).
    """
    import numpy as np

    from tpusparse.types import CSR

    if (threshold is None) == (density is None):
        raise ValueError("specify exactly one of threshold / density")

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    sparse_weights = {}
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        if any(p in name for p in path_patterns) and getattr(leaf, "ndim", 0) == 2:
            w = np.asarray(leaf)
            if density is not None:
                k = max(1, int(round(density * w.size)))
                thr = np.partition(np.abs(w).ravel(), w.size - k)[w.size - k]
            else:
                thr = threshold
            mask = np.abs(w) >= thr
            sparse_weights[name] = CSR.from_dense(w * mask)
            leaf = jnp.asarray(w * mask)
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves), sparse_weights
