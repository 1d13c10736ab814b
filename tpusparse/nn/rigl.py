"""Dynamic sparse training (RigL-style prune/regrow) utilities.

No reference analog (the reference only CONSUMES fixed sparsity,
SURVEY.md §2) — this is how sparsity gets *produced*: train with a
dense weight under a 0/1 mask, periodically drop the weakest active
connections (lowest |w|) and regrow the most promising inactive ones
(highest |grad|), then harvest the final mask into CSR + plans for the
framework's sparse executors at inference.

TPU-first design choices:
  * the mask is a dense same-shape array, NOT a CSR pattern — pattern
    churn under jit would retrace every update; a masked dense matmul
    keeps one static XLA program for the whole run and the MXU is
    fastest on dense blocks anyway (training-time FLOP savings from
    unstructured sparsity don't exist on any dense-matrix unit),
  * drop/grow keeps nnz EXACTLY constant via two `top_k` calls, so the
    update itself jits (Evci et al.'s RigL recipe, re-derived),
  * the payoff at inference goes through `harvest` → `prune_csr`-style
    CSR + the plan-cached SpMM executors.

All utilities operate on pytrees: masks mirror the params tree, with
non-matrix leaves (biases, norms) left unmasked (mask = None).

The training recipe (the invariant that makes the grow signal work):
params STAY masked — inactive entries identically zero — and the
forward uses the raw weight (NOT ``w * mask``, whose chain rule would
zero the gradient at inactive positions). Then `value_and_grad` yields
the DENSE gradient RigL grows from; per step apply `mask_grads` before
the optimizer update and `apply_masks` after it, and every few hundred
steps call `rigl_update_tree` with that dense gradient followed by one
`apply_masks`.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.types import CSR

__all__ = [
    "random_mask",
    "init_masks",
    "apply_masks",
    "mask_grads",
    "rigl_update",
    "rigl_update_tree",
    "cosine_drop_fraction",
    "harvest_csr",
    "sparsity_of",
]


def random_mask(key, shape: Tuple[int, ...], density: float) -> jnp.ndarray:
    """0/1 float mask with exactly round(density·size) ones, uniform."""
    size = int(np.prod(shape))
    nnz = int(round(density * size))
    nnz = max(1, min(size, nnz))
    scores = jax.random.uniform(key, (size,))
    thresh = jax.lax.top_k(scores, nnz)[0][-1]
    return (scores >= thresh).astype(jnp.float32).reshape(shape)


def _is_matrix(x) -> bool:
    return hasattr(x, "ndim") and x.ndim == 2


def init_masks(
    params: Any,
    density: float,
    key,
    select: Optional[Callable[[jnp.ndarray], bool]] = None,
) -> Any:
    """Mask pytree mirroring `params`: a random fixed-nnz mask for every
    leaf `select` accepts (default: all 2-D kernels), None elsewhere."""
    select = select or _is_matrix
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    masked = [
        random_mask(k, x.shape, density) if select(x) else None
        for x, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, masked)


def _tree_map_masked(fn, masks, *trees):
    return jax.tree_util.tree_map(
        lambda m, *xs: xs[0] if m is None else fn(m, *xs),
        masks,
        *trees,
        is_leaf=lambda x: x is None,
    )


def apply_masks(params: Any, masks: Any) -> Any:
    """w ← w ⊙ mask on every masked leaf (run after each optimizer step
    so momentum can't resurrect pruned weights)."""
    return _tree_map_masked(lambda m, w: w * m, masks, params)


def mask_grads(grads: Any, masks: Any) -> Any:
    """g ← g ⊙ mask: restrict the optimizer to active connections (the
    dense grads themselves still exist — RigL uses them to grow)."""
    return _tree_map_masked(lambda m, g: g * m, masks, grads)


def rigl_update(
    mask: jnp.ndarray,
    w: jnp.ndarray,
    grad: jnp.ndarray,
    drop_fraction: float,
) -> jnp.ndarray:
    """One prune/regrow step on a single mask; nnz is exactly preserved.

    Drops the `k = floor(drop_fraction · nnz)` active connections with
    the smallest |w| and grows the k inactive connections with the
    largest |grad| (ties broken by position). Jittable: k is static,
    selection is two `top_k` passes.
    """
    if isinstance(mask, jax.core.Tracer):
        raise ValueError(
            "rigl_update needs a concrete mask (top_k sizes are static); "
            "update masks outside jit — they only change every few "
            "hundred steps"
        )
    nnz = int(np.round(float(jax.device_get(mask.sum()))))
    return _rigl_update_static(mask, w, grad, drop_fraction, nnz)


def _rigl_update_static(mask, w, grad, drop_fraction, nnz):
    size = int(np.prod(mask.shape))
    k = int(np.floor(drop_fraction * nnz))
    k = min(k, size - nnz)  # can't grow beyond the inactive pool
    if k <= 0:
        return mask
    m = mask.reshape(-1)
    aw = jnp.abs(w.reshape(-1))
    ag = jnp.abs(grad.reshape(-1))
    def _top_with_ties(scores, valid, count):
        """Exactly-`count` strongest of `scores` over `valid`: everything
        STRICTLY above the threshold always survives; only entries tied
        AT the threshold are trimmed (positionally) to fill the budget —
        a purely positional cumsum trim can prune strictly-stronger
        entries that appear after a run of ties."""
        masked = jnp.where(valid, scores, -jnp.inf)
        thresh = jax.lax.top_k(masked, count)[0][-1]
        above = (masked > thresh) & valid
        tie = (masked == thresh) & valid
        budget = count - jnp.sum(above)
        return above | (tie & (jnp.cumsum(tie) <= budget))

    # keep the (nnz - k) strongest active weights
    keep_n = nnz - k
    if keep_n > 0:
        kept = _top_with_ties(aw, m > 0, keep_n)
    else:
        kept = jnp.zeros_like(m, bool)
    # grow the k highest-|grad| currently-inactive positions
    grown = _top_with_ties(ag, m == 0, k)
    return (kept | grown).astype(mask.dtype).reshape(mask.shape)


def rigl_update_tree(
    masks: Any, params: Any, grads: Any, drop_fraction: float
) -> Any:
    """`rigl_update` across a mask pytree (None leaves stay None)."""
    return jax.tree_util.tree_map(
        lambda m, w, g: None
        if m is None
        else rigl_update(m, w, g, drop_fraction),
        masks,
        params,
        grads,
        is_leaf=lambda x: x is None,
    )


def cosine_drop_fraction(
    step: int, total_steps: int, alpha: float = 0.3
) -> float:
    """RigL's annealed drop fraction α/2·(1 + cos(π·t/T)): aggressive
    exploration early, frozen topology late."""
    t = min(max(step, 0), total_steps)
    return 0.5 * alpha * (1.0 + float(np.cos(np.pi * t / total_steps)))


def harvest_csr(w: jnp.ndarray, mask: jnp.ndarray) -> CSR:
    """Final mask ⊙ weight as CSR (host pattern pass) — feed to
    `SparseLinear`/`ops.spmm` plans for sparse inference."""
    wm = np.asarray(w) * np.asarray(mask)
    keep = np.asarray(mask).reshape(-1) > 0
    m_, n_ = wm.shape
    rows, cols = np.nonzero(np.asarray(mask) > 0)
    indptr = np.zeros(m_ + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=m_), out=indptr[1:])
    return CSR(
        data=jnp.asarray(wm.reshape(-1)[keep]),
        indices=cols.astype(np.int32),
        indptr=indptr.astype(np.int32),
        shape=(m_, n_),
    )


def sparsity_of(masks: Any) -> float:
    """Fraction of masked-leaf entries that are ZERO (1 − density)."""
    ones = 0
    total = 0
    for m in jax.tree_util.tree_leaves(
        masks, is_leaf=lambda x: x is None
    ):
        if m is None:
            continue
        ones += int(np.asarray(m).sum())
        total += int(np.asarray(m).size)
    return 1.0 - ones / max(total, 1)
