"""Inspector-executor plans for tiled SpMM — the TPU-native analog of the
reference's TiledSpMM inspector (src/sparse_mm.cu:137-368) and its
layer-keyed plan registries (src/custom_mm.cpp:283-357, :219-281).

Reference idea (K8): a one-time CPU pass over the CSR pattern builds a
GPU-friendly sliced-ELL plan (footprint compression + per-warp ELL pad
widths + interleaved index/value arrays) that the executor kernel then
reuses every multiply.

TPU-native redesign (NOT a translation):
  * The MXU wants dense (8,128)-multiple blocks, so the plan *densifies*
    the pattern into BSR blocks of (block_m, block_k) and ELL-pads the
    per-row-block block lists to a fixed width L — the direct analog of
    `elldispl/ellindex/ellvalue` (sparse_mm.cu:193-276) but at MXU-block
    granularity instead of per-element.
  * Padded ELL slots repeat the row-block's last valid block index, so the
    Pallas pipeline re-fetches the same B tile (a no-op DMA) and the kernel
    skips the FLOPs via `@pl.when(l < nslots[i])` — variable nnz per row
    inside a fixed grid, without wasted bandwidth.
  * Plans are keyed by a pattern fingerprint in a process-global cache —
    replacing the reference's mutable global handle arrays + string-keyed
    `layer_lookup` map (custom_mm.cpp:81-83) with content addressing.
  * Values are NOT baked into the plan: a jittable scatter maps CSR values
    into block form each call, so training steps (values change, pattern
    fixed) never rebuild or retrace.
  * The inspector runs in C++ (csrc/inspector.cpp, OpenMP) when the native
    extension is built, with a numpy fallback — mirroring the reference's
    host-side OpenMP inspector.

The PRINT-gated stats report of the reference inspector (sparse_mm.cu:
139-161, 303-328) becomes `Plan.report()`: density, padding overhead, VMEM
footprint, and a projected roofline (bytes, FLOPs, speed-of-light %).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.types import CSR, Shape2
from tpusparse.utils.config import get_config, cdiv

# Per-chip speed-of-light constants for roofline projection (TPU v5e).
# Overridable for other generations via set_roofline_constants.
_ROOFLINE = {
    "peak_bf16_flops": 197e12,  # MXU bf16 FLOP/s
    "peak_fp32_flops": 197e12 / 6,  # fp32 "highest" = 6-pass bf16
    "hbm_bandwidth": 819e9,  # bytes/s
}


def set_roofline_constants(**kwargs):
    _ROOFLINE.update(kwargs)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Plan:
    """A compiled sparsity-pattern plan for one (pattern, blocksize)."""

    block_cols: jnp.ndarray  # (nbr, L) int32: col-block id per ELL slot
    nslots: jnp.ndarray  # (nbr,) int32: valid slots per row-block
    scatter_idx: jnp.ndarray  # (nnz,) int32: csr nnz -> flat block_vals idx
    shape: Shape2  # logical (m, k) of the sparse operand
    blocksize: Shape2  # (block_m, block_k)
    ell_width: int  # L
    nnz: int
    nblocks: int  # valid (non-pad) blocks
    stats: Tuple[Tuple[str, float], ...] = ()

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        children = (self.block_cols, self.nslots, self.scatter_idx)
        aux = (
            self.shape,
            self.blocksize,
            self.ell_width,
            self.nnz,
            self.nblocks,
            self.stats,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        block_cols, nslots, scatter_idx = children
        shape, blocksize, ell_width, nnz, nblocks, stats = aux
        return cls(
            block_cols=block_cols,
            nslots=nslots,
            scatter_idx=scatter_idx,
            shape=shape,
            blocksize=blocksize,
            ell_width=ell_width,
            nnz=nnz,
            nblocks=nblocks,
            stats=stats,
        )

    # -- derived static geometry --------------------------------------------
    @property
    def num_row_blocks(self) -> int:
        return cdiv(self.shape[0], self.blocksize[0])

    @property
    def num_col_blocks(self) -> int:
        return cdiv(self.shape[1], self.blocksize[1])

    @property
    def num_slots(self) -> int:
        return self.num_row_blocks * self.ell_width

    # -- value packing (jittable; runs every call, pattern-free) ------------
    # NOTE: scatter_idx referenced under a jit trace embeds as an HLO
    # literal (closed-over DEVICE arrays embed all the same — measured).
    # At 26.8M nnz that is a ~107MB compile payload, which the axon
    # tunnel rejects (remote_compile HTTP 413). Callers who jit over
    # huge patterns must pre-pack eagerly and carry packed values as
    # ARGUMENTS (spmm_blocks — the inspect-once/execute-many path), as
    # bench.py and realmatrix_benchmark do.
    def pack_values(self, data: jnp.ndarray) -> jnp.ndarray:
        """Scatter CSR value vector into ELL block form (num_slots, bm, bk)."""
        bm, bk = self.blocksize
        flat = jnp.zeros((self.num_slots * bm * bk,), dtype=data.dtype)
        flat = flat.at[self.scatter_idx].set(data)
        return flat.reshape(self.num_slots, bm, bk)

    def unpack_values(self, block_vals: jnp.ndarray) -> jnp.ndarray:
        """Gather per-nonzero values back out of block form (for dA grads)."""
        return block_vals.reshape(-1)[self.scatter_idx]

    def slot_valid_mask(self) -> jnp.ndarray:
        """(nbr, L) 1/0 mask of valid (non-pad) ELL slots (jittable)."""
        L = self.ell_width
        slots = jnp.arange(L, dtype=jnp.int32)[None, :]
        return (slots < jnp.asarray(self.nslots)[:, None]).astype(jnp.float32)

    def blocks_to_dense(self, block_vals: jnp.ndarray) -> jnp.ndarray:
        """Scatter ELL blocks back to a dense (m, k) matrix (jittable).

        Padded slots repeat a valid block id, so they must be masked out
        before the scatter-add to avoid double counting.
        """
        bm, bk = self.blocksize
        nbr, nbc, L = self.num_row_blocks, self.num_col_blocks, self.ell_width
        blk = block_vals.reshape(nbr, L, bm, bk)
        blk = blk * self.slot_valid_mask()[..., None, None].astype(blk.dtype)
        rows = jnp.broadcast_to(
            jnp.arange(nbr, dtype=jnp.int32)[:, None], (nbr, L)
        )
        dense4 = jnp.zeros((nbr, nbc, bm, bk), dtype=blk.dtype)
        dense4 = dense4.at[rows, jnp.asarray(self.block_cols)].add(blk)
        full = dense4.transpose(0, 2, 1, 3).reshape(nbr * bm, nbc * bk)
        return full[: self.shape[0], : self.shape[1]]

    # -- reporting -----------------------------------------------------------
    def report(self, n_cols: int = 256, dtype_bytes: int = 4) -> Dict[str, float]:
        """Inspector stats + projected roofline for C = A @ B with B (k, n).

        TPU analog of the reference's PRINT-mode occupancy/padding report
        (sparse_mm.cu:139-161, 303-328).
        """
        m, k = self.shape
        bm, bk = self.blocksize
        d = dict(self.stats)
        useful_flops = 2.0 * self.nnz * n_cols
        block_flops = 2.0 * self.nblocks * bm * bk * n_cols
        # bytes: block values + gathered B tiles + C out
        bytes_moved = (
            self.nblocks * bm * bk * dtype_bytes
            + self.nblocks * bk * n_cols * dtype_bytes
            + m * n_cols * dtype_bytes
        )
        peak_flops = _ROOFLINE["peak_fp32_flops"]
        bw = _ROOFLINE["hbm_bandwidth"]
        t_compute = block_flops / peak_flops
        t_memory = bytes_moved / bw
        t_sol = max(t_compute, t_memory)
        d.update(
            density=self.nnz / float(m * k),
            nnz=float(self.nnz),
            nblocks=float(self.nblocks),
            ell_width=float(self.ell_width),
            block_fill=self.nnz / float(max(self.nblocks, 1) * bm * bk),
            ell_pad_overhead=(self.num_slots - self.nblocks)
            / float(max(self.nblocks, 1)),
            vmem_bytes_per_step=float(
                (bm * bk + bk * n_cols + bm * n_cols) * dtype_bytes
            ),
            useful_flops=useful_flops,
            block_flops=block_flops,
            bytes_moved=float(bytes_moved),
            arithmetic_intensity=block_flops / max(bytes_moved, 1),
            projected_time_s=t_sol,
            projected_gflops_effective=useful_flops / t_sol / 1e9,
            projected_nnz_per_s=self.nnz * n_cols / t_sol,
            bound="compute" if t_compute > t_memory else "memory",
        )
        return d


# ----------------------------------------------------------------------------
# Inspector (host side). numpy implementation; csrc/inspector.cpp provides an
# OpenMP-parallel drop-in used automatically when built (see runtime/native.py).
# ----------------------------------------------------------------------------


def _inspect_numpy(
    indptr: np.ndarray, indices: np.ndarray, shape: Shape2, blocksize: Shape2
):
    m, k = shape
    bm, bk = blocksize
    nbr, nbc = cdiv(m, bm), cdiv(k, bk)
    nnz = int(indices.shape[0])

    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    cols = indices.astype(np.int64)
    brow = rows // bm
    bcol = cols // bk

    keys = brow * nbc + bcol
    uniq, inv = np.unique(keys, return_inverse=True)
    ub = (uniq // nbc).astype(np.int64)
    uc = (uniq % nbc).astype(np.int64)

    counts = np.bincount(ub, minlength=nbr)
    ell_width = int(max(counts.max(initial=0), 1))
    group_start = np.zeros(nbr + 1, dtype=np.int64)
    np.cumsum(counts, out=group_start[1:])
    slot_of_uniq = np.arange(len(uniq), dtype=np.int64) - group_start[ub]

    block_cols = np.zeros((nbr, ell_width), dtype=np.int32)
    block_cols[ub, slot_of_uniq] = uc
    # Pad slots repeat the last valid block id so the executor's pipeline
    # re-fetches an already-resident B tile instead of a new one.
    for i in range(nbr):
        c = counts[i]
        if 0 < c < ell_width:
            block_cols[i, c:] = block_cols[i, c - 1]

    slot = slot_of_uniq[inv]
    scatter_idx = (
        (brow * ell_width + slot) * (bm * bk) + (rows % bm) * bk + (cols % bk)
    )
    # keep int64 when the flat pack buffer exceeds int32 (skewed patterns
    # can drive nbr*L*bm*bk past 2^31; an unconditional downcast wraps to
    # negative indices and silently misplaces values — the native
    # inspector guards this identically, runtime/native.py)
    if nbr * np.int64(ell_width) * bm * bk < 2**31:
        scatter_idx = scatter_idx.astype(np.int32)

    return block_cols, counts.astype(np.int32), scatter_idx, ell_width, len(uniq)


def _inspect(indptr, indices, shape, blocksize):
    try:
        from tpusparse.runtime import native

        if native.available():
            return native.inspect(indptr, indices, shape, blocksize)
    except ImportError:
        pass
    return _inspect_numpy(indptr, indices, shape, blocksize)


def build_plan(
    pattern: CSR, blocksize: Optional[Shape2] = None, use_cache: bool = True
) -> Plan:
    """Inspect a CSR pattern into a tiled-SpMM Plan (host-side, one-time).

    Analog of `TiledSpMM_inspect` (sparse_mm.cu:137-368) + the registry
    append (custom_mm.cpp:315-318), but cached by content fingerprint.
    """
    cfg = get_config()
    blocksize = blocksize or (cfg.spmm_block_m, cfg.spmm_block_k)
    indptr = np.asarray(pattern.indptr)
    indices = np.asarray(pattern.indices)
    key = _fingerprint(pattern.shape, blocksize, indptr, indices)
    if use_cache and key in _PLAN_CACHE:
        _CACHE_STATS["hits"] += 1
        return _PLAN_CACHE[key]
    _CACHE_STATS["misses"] += 1

    block_cols, nslots, scatter_idx, ell_width, nblocks = _inspect(
        indptr, indices, pattern.shape, blocksize
    )
    bm, bk = blocksize
    # Plan children stay host numpy arrays: build_plan may run at trace
    # time (inside jit), where jnp constructors would capture tracers into
    # the process-global cache. numpy constants are trace-safe and are
    # device_put automatically at kernel-call boundaries.
    plan = Plan(
        block_cols=np.ascontiguousarray(block_cols),
        nslots=np.ascontiguousarray(nslots),
        scatter_idx=np.ascontiguousarray(scatter_idx),
        shape=pattern.shape,
        blocksize=(bm, bk),
        ell_width=ell_width,
        nnz=int(indices.shape[0]),
        nblocks=int(nblocks),
    )
    if use_cache:
        _PLAN_CACHE[key] = plan
    return plan


_BLOCK_T_CACHE: Dict[str, tuple] = {}


def block_transpose_plan(plan: Plan):
    """(transpose Plan, slot permutation) derived from a Plan's BLOCK
    pattern alone — no CSR needed.

    Used by the `spmm_blocks` backward (dB = Aᵀ·dC): A's packed ELL
    blocks transpose slot-wise — the block at (row-block i, col-block j)
    becomes the (j, i) block of Aᵀ with its (bm, bk) tile transposed —
    so the transpose operand is `swapaxes(blocks, 1, 2)[perm]` with pad
    slots mapped to a zero block (index == plan.num_slots), and dB runs
    the same tiled/resident executor as any forward. This replaces the
    former blocks_to_dense densify (a full (m, k) scatter per training
    step; reference backward semantics matmuls.py:100-102 at
    plan-cached speed).

    The returned Plan carries an empty scatter_idx (no nnz-level
    packing exists for a block-only pattern); executors never read it.
    Host-side, cached by block-pattern fingerprint.
    """
    nbr, nbc = plan.num_row_blocks, plan.num_col_blocks
    L = plan.ell_width
    bc = np.asarray(plan.block_cols).reshape(nbr, L)
    ns = np.asarray(plan.nslots)
    key = _fingerprint(plan.shape, plan.blocksize, ns, bc)
    if key in _BLOCK_T_CACHE:
        return _BLOCK_T_CACHE[key]

    valid = np.arange(L, dtype=np.int64)[None, :] < ns[:, None]
    i_ids, l_ids = np.nonzero(valid)
    j_ids = bc[i_ids, l_ids].astype(np.int64)
    slot_ids = i_ids * L + l_ids
    order = np.lexsort((i_ids, j_ids))  # (col-block, row-block): Aᵀ order
    tj, ti, tslot = j_ids[order], i_ids[order], slot_ids[order]
    counts = np.bincount(tj, minlength=nbc)
    L_t = max(int(counts.max()) if counts.size else 1, 1)
    row_start = np.zeros(nbc, dtype=np.int64)
    np.cumsum(counts[:-1], out=row_start[1:])
    pos = np.arange(tj.size, dtype=np.int64) - np.repeat(row_start, counts)
    block_cols_t = np.zeros((nbc, L_t), np.int32)
    block_cols_t[tj, pos] = ti
    t_slot_perm = np.full((nbc * L_t,), plan.num_slots, np.int64)
    t_slot_perm[tj * L_t + pos] = tslot

    m, k = plan.shape
    bm, bk = plan.blocksize
    plan_t = Plan(
        block_cols=np.ascontiguousarray(block_cols_t),
        nslots=counts.astype(np.int32),
        scatter_idx=np.zeros((0,), np.int32),
        shape=(k, m),
        blocksize=(bk, bm),
        ell_width=L_t,
        nnz=plan.nnz,
        nblocks=plan.nblocks,
    )
    out = (plan_t, np.ascontiguousarray(t_slot_perm.astype(np.int32)))
    _BLOCK_T_CACHE[key] = out
    return out


_PAIR_CACHE: Dict[str, tuple] = {}


def build_plan_pair(pattern: CSR, blocksize: Optional[Shape2] = None):
    """(plan for A, plan for Aᵀ, permutation mapping A.data -> Aᵀ.data).

    The transpose plan drives the dB = Aᵀ·dC backward SpMM
    (reference backward: matmuls.py:100-102 / :253-254).

    Cached by pattern fingerprint (the t_perm lexsort over nnz would
    otherwise rerun on every call — seconds at tens of millions of nnz).
    """
    plan = build_plan(pattern, blocksize)
    indptr = np.asarray(pattern.indptr)
    indices = np.asarray(pattern.indices).astype(np.int64)
    key = _fingerprint(pattern.shape, plan.blocksize, indptr, indices.astype(np.int32))
    hit = _PAIR_CACHE.get(key)
    if hit is not None:
        return hit
    m, k = pattern.shape
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    t_perm = np.lexsort((rows, indices))  # sort by (col, row): Aᵀ CSR order
    t_indices = rows[t_perm].astype(np.int32)
    t_counts = np.bincount(indices, minlength=k)
    t_indptr = np.zeros(k + 1, dtype=np.int32)
    np.cumsum(t_counts, out=t_indptr[1:])
    bm, bk = plan.blocksize
    # host numpy throughout (see build_plan note on trace-time safety)
    pattern_t = CSR(
        data=np.zeros((plan.nnz,), dtype=np.dtype(pattern.dtype)),
        indices=t_indices,
        indptr=t_indptr,
        shape=(k, m),
    )
    plan_t = build_plan(pattern_t, (bk, bm))
    out = (plan, plan_t, t_perm.astype(np.int32))
    _PAIR_CACHE[key] = out
    return out


# -- compact plan (padding-free executor layout) -------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class CompactPlan:
    """Padding-free slot layout: slots stored contiguously per row-block.

    The ELL layout DMAs a full (L, bm, bk) value block per row-block
    through the grid pipeline — including pad slots (on skewed patterns
    the pad traffic approaches the useful traffic; L=25 vs mean 13 on the
    headline workload). Here values live compactly in HBM as
    (nblocks, bm, bk); the executor scalar-prefetches per-row-block base
    offsets and DMAs each slot's value block through the same manual ring
    as its B tile, so only occupied blocks ever move.
    """

    cols: jnp.ndarray  # (nblocks,) int32: col-block id per slot
    row_base: jnp.ndarray  # (nbr + 1,) int32: slot range per row-block
    scatter_idx: jnp.ndarray  # (nnz,) int64: csr nnz -> flat compact vals idx
    shape: Shape2
    blocksize: Shape2
    nnz: int
    nblocks: int

    def tree_flatten(self):
        children = (self.cols, self.row_base, self.scatter_idx)
        aux = (self.shape, self.blocksize, self.nnz, self.nblocks)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        cols, row_base, scatter_idx = children
        shape, blocksize, nnz, nblocks = aux
        return cls(
            cols=cols,
            row_base=row_base,
            scatter_idx=scatter_idx,
            shape=shape,
            blocksize=blocksize,
            nnz=nnz,
            nblocks=nblocks,
        )

    @property
    def num_row_blocks(self) -> int:
        return cdiv(self.shape[0], self.blocksize[0])

    @property
    def num_col_blocks(self) -> int:
        return cdiv(self.shape[1], self.blocksize[1])

    def pack_values(self, data: jnp.ndarray) -> jnp.ndarray:
        bm, bk = self.blocksize
        flat = jnp.zeros((self.nblocks * bm * bk,), dtype=data.dtype)
        flat = flat.at[self.scatter_idx].set(data)
        return flat.reshape(self.nblocks, bm, bk)

    def unpack_values(self, block_vals: jnp.ndarray) -> jnp.ndarray:
        return block_vals.reshape(-1)[self.scatter_idx]


def compact_plan(plan: Plan) -> CompactPlan:
    """Derive the padding-free layout from an ELL Plan (host, cached)."""
    fp = hashlib.sha1(
        np.asarray(plan.block_cols).tobytes()
        + np.asarray(plan.nslots).tobytes()
        # scatter_idx distinguishes matrices with identical BLOCK structure
        # but different intra-block nnz positions — hashing only the block
        # layout let two such patterns collide and reuse the wrong
        # value-scatter (wrong results, found by review)
        + np.asarray(plan.scatter_idx).tobytes()
        + repr((plan.shape, plan.blocksize, "compact")).encode()
    ).hexdigest()
    hit = _COMPACT_CACHE.get(fp)
    if hit is not None:
        return hit

    bc = np.asarray(plan.block_cols)
    ns = np.asarray(plan.nslots).astype(np.int64)
    nbr, L = bc.shape
    bm, bk = plan.blocksize

    row_base = np.zeros(nbr + 1, dtype=np.int64)
    np.cumsum(ns, out=row_base[1:])
    valid = np.arange(L)[None, :] < ns[:, None]
    rb_ids, l_ids = np.nonzero(valid)
    cols = bc[rb_ids, l_ids].astype(np.int32)

    old_slot = rb_ids * np.int64(L) + l_ids
    o2n = np.zeros(nbr * L, dtype=np.int64)
    o2n[old_slot] = row_base[rb_ids] + l_ids
    bb = bm * bk
    old_scatter = np.asarray(plan.scatter_idx, dtype=np.int64)
    scatter_idx = o2n[old_scatter // bb] * bb + old_scatter % bb

    cp = CompactPlan(
        cols=cols,
        row_base=row_base.astype(np.int32),
        scatter_idx=scatter_idx,
        shape=plan.shape,
        blocksize=plan.blocksize,
        nnz=plan.nnz,
        nblocks=int(ns.sum()),
    )
    _COMPACT_CACHE[fp] = cp
    return cp


_COMPACT_CACHE: Dict[str, "CompactPlan"] = {}


# -- grouped plan (low-fill executor) -----------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class GroupedPlan:
    """Plan repacked so one kernel cell owns `group_size` row-blocks.

    On low-fill patterns (~1 nnz per occupied block) the per-row-block
    executor spends its time on grid-cell overhead: each cell has too few
    slots to fill its DMA ring, so every cell serializes on HBM gather
    latency. Grouping concatenates the ELL slots of G consecutive
    row-blocks into one stream — the analog of the reference assigning
    1024 rows to one thread-block (sparse_mm.cu:163-187) — so hundreds of
    B-tile fetches stay in flight across one cell. `local_rb` records
    which row-block of the group each slot accumulates into.
    """

    block_cols: jnp.ndarray  # (ngroups, Lg) int32: col-block per slot
    local_rb: jnp.ndarray  # (ngroups, Lg) int32: row-block within group
    nslots: jnp.ndarray  # (ngroups,) int32: valid slots per group
    scatter_idx: jnp.ndarray  # (nnz,) int64: csr nnz -> flat grouped vals idx
    shape: Shape2
    blocksize: Shape2
    group_size: int
    ell_width: int  # Lg
    nnz: int
    nblocks: int

    def tree_flatten(self):
        children = (self.block_cols, self.local_rb, self.nslots, self.scatter_idx)
        aux = (
            self.shape,
            self.blocksize,
            self.group_size,
            self.ell_width,
            self.nnz,
            self.nblocks,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        block_cols, local_rb, nslots, scatter_idx = children
        shape, blocksize, group_size, ell_width, nnz, nblocks = aux
        return cls(
            block_cols=block_cols,
            local_rb=local_rb,
            nslots=nslots,
            scatter_idx=scatter_idx,
            shape=shape,
            blocksize=blocksize,
            group_size=group_size,
            ell_width=ell_width,
            nnz=nnz,
            nblocks=nblocks,
        )

    @property
    def num_groups(self) -> int:
        return cdiv(cdiv(self.shape[0], self.blocksize[0]), self.group_size)

    @property
    def num_col_blocks(self) -> int:
        return cdiv(self.shape[1], self.blocksize[1])

    @property
    def num_slots(self) -> int:
        return self.num_groups * self.ell_width

    def pack_values(self, data: jnp.ndarray) -> jnp.ndarray:
        bm, bk = self.blocksize
        flat = jnp.zeros((self.num_slots * bm * bk,), dtype=data.dtype)
        flat = flat.at[self.scatter_idx].set(data)
        return flat.reshape(self.num_slots, bm, bk)

    def unpack_values(self, block_vals: jnp.ndarray) -> jnp.ndarray:
        return block_vals.reshape(-1)[self.scatter_idx]


def group_plan(plan: Plan, group_size: int = 64) -> GroupedPlan:
    """Repack a row-block Plan into a GroupedPlan (host-side, cached)."""
    fp = hashlib.sha1(
        np.asarray(plan.block_cols).tobytes()
        + np.asarray(plan.nslots).tobytes()
        + np.asarray(plan.scatter_idx).tobytes()  # see compact_plan note
        + repr((plan.shape, plan.blocksize)).encode()
    ).hexdigest()
    gkey = (fp, group_size)
    hit = _GROUPED_CACHE.get(gkey)
    if hit is not None:
        return hit

    bc = np.asarray(plan.block_cols)
    ns = np.asarray(plan.nslots)
    nbr, L = bc.shape
    G = group_size
    ng = cdiv(nbr, G)
    bm, bk = plan.blocksize

    valid = np.arange(L)[None, :] < ns[:, None]
    rb_ids, l_ids = np.nonzero(valid)  # row-block-major order
    g_ids = rb_ids // G
    counts = np.bincount(g_ids, minlength=ng)
    Lg = int(max(counts.max(initial=0), 1))
    offsets = np.zeros(ng + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    pos = np.arange(len(g_ids), dtype=np.int64) - offsets[g_ids]

    gcols = np.zeros((ng, Lg), dtype=np.int32)
    glrb = np.zeros((ng, Lg), dtype=np.int32)
    gcols[g_ids, pos] = bc[rb_ids, l_ids]
    glrb[g_ids, pos] = (rb_ids % G).astype(np.int32)

    # remap nnz scatter destinations: old slot rb*L+l -> new slot g*Lg+pos
    old_slot = rb_ids * np.int64(L) + l_ids
    o2n = np.zeros(nbr * L, dtype=np.int64)
    o2n[old_slot] = g_ids * np.int64(Lg) + pos
    bb = bm * bk
    old_scatter = np.asarray(plan.scatter_idx, dtype=np.int64)
    scatter_idx = o2n[old_scatter // bb] * bb + old_scatter % bb

    gp = GroupedPlan(
        block_cols=gcols,
        local_rb=glrb,
        nslots=counts.astype(np.int32),
        scatter_idx=scatter_idx,
        shape=plan.shape,
        blocksize=plan.blocksize,
        group_size=G,
        ell_width=Lg,
        nnz=plan.nnz,
        nblocks=plan.nblocks,
    )
    _GROUPED_CACHE[gkey] = gp
    return gp


_GROUPED_CACHE: Dict[Tuple[str, int], "GroupedPlan"] = {}


# -- footprint plan (B-tile-reuse executor) -----------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class FootprintPlan:
    """Slots of S consecutive row-blocks sorted by column — the TPU analog
    of the reference's footprint compression (sparse_mm.cu:163-187: per
    1024-row thread-block, compute the set of B rows touched and stage
    each exactly once in shared memory).

    Roofline motivation (measured on the v5e headline workload): the
    per-row-block executors are HBM-bandwidth-bound, and ~2/3 of their
    traffic is B tiles, each re-fetched by every row-block that touches
    its column. Here one kernel cell owns a super-row-block of S
    row-blocks; its slots are sorted by column-block, so each *distinct*
    column's B tile is DMA'd once per super-row and consumed by all of
    that super-row's blocks in that column. B-tile fetch reduction at
    block fill p: S·p / (1-(1-p)^S) — up to ~11x measured on low-fill
    plans.

    Values are ELL-padded per super-row (width Ls = max slots over
    supers) and ride the normal grid pipeline: Mosaic cannot DMA-slice
    HBM value tiles whose last dim is not 128-aligned, so the compact
    per-slot vals ring is only legal for bk a multiple of 128 — the
    grid-pipeline layout works for every blocksize.
    """

    ucols: jnp.ndarray  # (ns, Lu) int32: distinct col-block ids per super
    ucnt: jnp.ndarray  # (ns,) int32: number of distinct col-blocks
    nslots: jnp.ndarray  # (ns,) int32: valid slots per super
    lrow: jnp.ndarray  # (ns, Ls) int32: row-block within super (0..S-1)
    bslot: jnp.ndarray  # (ns, Ls) int32: distinct-col ordinal of the slot
    newcol: jnp.ndarray  # (ns, Ls) int32: 1 iff slot starts a new col
    scatter_idx: jnp.ndarray  # (nnz,) int64: csr nnz -> flat packed vals idx
    shape: Shape2
    blocksize: Shape2
    rows_per_super: int  # S
    u_width: int  # Lu
    ell_width: int  # Ls
    nnz: int
    nblocks: int
    ntiles: int  # total distinct (super, col) B-tile fetches

    def tree_flatten(self):
        children = (
            self.ucols,
            self.ucnt,
            self.nslots,
            self.lrow,
            self.bslot,
            self.newcol,
            self.scatter_idx,
        )
        aux = (
            self.shape,
            self.blocksize,
            self.rows_per_super,
            self.u_width,
            self.ell_width,
            self.nnz,
            self.nblocks,
            self.ntiles,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        ucols, ucnt, nslots, lrow, bslot, newcol, scatter_idx = children
        (shape, blocksize, rows_per_super, u_width, ell_width, nnz, nblocks,
         ntiles) = aux
        return cls(
            ucols=ucols,
            ucnt=ucnt,
            nslots=nslots,
            lrow=lrow,
            bslot=bslot,
            newcol=newcol,
            scatter_idx=scatter_idx,
            shape=shape,
            blocksize=blocksize,
            rows_per_super=rows_per_super,
            u_width=u_width,
            ell_width=ell_width,
            nnz=nnz,
            nblocks=nblocks,
            ntiles=ntiles,
        )

    @property
    def num_row_blocks(self) -> int:
        return cdiv(self.shape[0], self.blocksize[0])

    @property
    def num_col_blocks(self) -> int:
        return cdiv(self.shape[1], self.blocksize[1])

    @property
    def num_supers(self) -> int:
        return cdiv(self.num_row_blocks, self.rows_per_super)

    @property
    def num_slots(self) -> int:
        return self.num_supers * self.ell_width

    def pack_values(self, data: jnp.ndarray) -> jnp.ndarray:
        bm, bk = self.blocksize
        flat = jnp.zeros((self.num_slots * bm * bk,), dtype=data.dtype)
        flat = flat.at[self.scatter_idx].set(data)
        return flat.reshape(self.num_slots, bm, bk)

    def unpack_values(self, block_vals: jnp.ndarray) -> jnp.ndarray:
        return block_vals.reshape(-1)[self.scatter_idx]


def footprint_plan(plan: Plan, rows_per_super: int = 16) -> FootprintPlan:
    """Derive the column-sorted super-row-block layout from an ELL Plan
    (host-side, cached)."""
    fp = hashlib.sha1(
        np.asarray(plan.block_cols).tobytes()
        + np.asarray(plan.nslots).tobytes()
        + np.asarray(plan.scatter_idx).tobytes()  # see compact_plan note
        + repr((plan.shape, plan.blocksize, "footprint")).encode()
    ).hexdigest()
    key = (fp, rows_per_super)
    hit = _FOOTPRINT_CACHE.get(key)
    if hit is not None:
        return hit

    bc = np.asarray(plan.block_cols)
    ns_arr = np.asarray(plan.nslots)
    nbr, L = bc.shape
    S = rows_per_super
    ns = cdiv(nbr, S)
    bm, bk = plan.blocksize

    valid = np.arange(L)[None, :] < ns_arr[:, None]
    rb_ids, l_ids = np.nonzero(valid)
    cols = bc[rb_ids, l_ids].astype(np.int64)
    s_ids = rb_ids // S

    order = np.lexsort((rb_ids, cols, s_ids))  # (super, col, row)
    srt_s = s_ids[order]
    srt_c = cols[order]
    nblocks = len(order)

    counts = np.bincount(srt_s, minlength=ns)
    sbase = np.zeros(ns + 1, dtype=np.int64)
    np.cumsum(counts, out=sbase[1:])
    Ls = int(max(counts.max(initial=0), 1))
    pos = np.arange(nblocks, dtype=np.int64) - sbase[srt_s]

    newcol_flat = np.ones(nblocks, dtype=np.int32)
    if nblocks > 1:
        same = (srt_s[1:] == srt_s[:-1]) & (srt_c[1:] == srt_c[:-1])
        newcol_flat[1:][same] = 0
    csum = np.cumsum(newcol_flat)
    start_csum = csum[sbase[srt_s]] if nblocks else np.zeros(0, np.int64)
    bslot_flat = (csum - start_csum).astype(np.int32)

    ucnt = np.bincount(srt_s, weights=newcol_flat, minlength=ns).astype(np.int32)
    Lu = int(max(ucnt.max(initial=0), 1))
    ucols = np.zeros((ns, Lu), dtype=np.int32)
    is_new = newcol_flat == 1
    ucols[srt_s[is_new], bslot_flat[is_new]] = srt_c[is_new].astype(np.int32)

    # padded per-super ELL layout — pad slots are zero-filled and NEVER
    # execute (the kernel's fori_loop stops at nslots[s]); do not read
    # them from a kernel extension without masking
    lrow = np.zeros((ns, Ls), dtype=np.int32)
    bslot = np.zeros((ns, Ls), dtype=np.int32)
    newcol = np.zeros((ns, Ls), dtype=np.int32)
    lrow[srt_s, pos] = (rb_ids[order] % S).astype(np.int32)
    bslot[srt_s, pos] = bslot_flat
    newcol[srt_s, pos] = newcol_flat

    # remap nnz scatter destinations: old ELL slot rb*L+l -> s*Ls+pos
    old_slot_sorted = (rb_ids * np.int64(L) + l_ids)[order]
    o2n = np.zeros(nbr * L, dtype=np.int64)
    o2n[old_slot_sorted] = srt_s * np.int64(Ls) + pos
    bb = bm * bk
    old_scatter = np.asarray(plan.scatter_idx, dtype=np.int64)
    scatter_idx = o2n[old_scatter // bb] * bb + old_scatter % bb

    fpl = FootprintPlan(
        ucols=ucols,
        ucnt=ucnt,
        nslots=counts.astype(np.int32),
        lrow=lrow,
        bslot=bslot,
        newcol=newcol,
        scatter_idx=scatter_idx,
        shape=plan.shape,
        blocksize=plan.blocksize,
        rows_per_super=S,
        u_width=Lu,
        ell_width=Ls,
        nnz=plan.nnz,
        nblocks=nblocks,
        ntiles=int(newcol_flat.sum()),
    )
    _FOOTPRINT_CACHE[key] = fpl
    return fpl


_FOOTPRINT_CACHE: Dict[Tuple[str, int], "FootprintPlan"] = {}


# -- plan cache ---------------------------------------------------------------

_PLAN_CACHE: Dict[str, Plan] = {}
_CACHE_STATS = {"hits": 0, "misses": 0}


def _fingerprint(shape, blocksize, indptr: np.ndarray, indices: np.ndarray) -> str:
    h = hashlib.sha1()
    h.update(repr((tuple(shape), tuple(blocksize))).encode())
    h.update(indptr.tobytes())
    h.update(indices.tobytes())
    return h.hexdigest()


def save_plan(plan: Plan, path: str) -> None:
    """Persist an inspected plan (inspect once at build time, load in
    serving jobs — the deployment form of the reference's inspect-once /
    multiply-many lifecycle, custom_mm.cpp:283-357)."""
    np.savez_compressed(
        path,
        block_cols=np.asarray(plan.block_cols),
        nslots=np.asarray(plan.nslots),
        scatter_idx=np.asarray(plan.scatter_idx),
        shape=np.asarray(plan.shape, dtype=np.int64),
        blocksize=np.asarray(plan.blocksize, dtype=np.int64),
        ell_width=np.asarray(plan.ell_width, dtype=np.int64),
        nnz=np.asarray(plan.nnz, dtype=np.int64),
        nblocks=np.asarray(plan.nblocks, dtype=np.int64),
    )


def load_plan(path: str) -> Plan:
    with np.load(path) as z:
        return Plan(
            block_cols=np.ascontiguousarray(z["block_cols"]),
            nslots=np.ascontiguousarray(z["nslots"]),
            scatter_idx=np.ascontiguousarray(z["scatter_idx"]),
            shape=tuple(int(v) for v in z["shape"]),
            blocksize=tuple(int(v) for v in z["blocksize"]),
            ell_width=int(z["ell_width"]),
            nnz=int(z["nnz"]),
            nblocks=int(z["nblocks"]),
        )


def plan_cache_info() -> Dict[str, int]:
    return {"size": len(_PLAN_CACHE), **_CACHE_STATS}


def clear_plan_cache():
    _PLAN_CACHE.clear()
    _PAIR_CACHE.clear()
    _BLOCK_T_CACHE.clear()
    _CACHE_STATS.update(hits=0, misses=0)
