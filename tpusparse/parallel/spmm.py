"""Multi-device SpMM: row-partitioned and ring-halo variants.

The multi-host capability the reference lacks (SURVEY.md §2.5/§5.8),
designed per BASELINE.json configs[4]: the sparse operand is row/block
partitioned per device; needed rows of the dense operand arrive via XLA
collectives inside shard_map:

  * `sharded_spmm` — A row-partitioned, B replicated: zero communication
    in the forward; each device runs its local tiled Pallas kernel.
  * `halo_spmm` — A partitioned in 2-D (row chunks × column strips), B
    row-sharded: the ring variant. Each of the ndev steps multiplies the
    locally-held B strip against the matching A column strip and
    `lax.ppermute`s the strip to the next device, so "halo rows" stream
    around the ring and DCN/ICI latency hides behind MXU work.

Plans for all chunks are padded to a common ELL width so the SPMD program
is identical on every device; values enter through ONE global scatter
(pack_values) keyed by a precomputed nnz → (chunk, slot, offset) map.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpusparse.kernels.tiled_spmm import tiled_spmm_pallas
from tpusparse.plan import Plan, _inspect_numpy
from tpusparse.parallel.mesh import shard_map
from tpusparse.types import CSR
from tpusparse.utils.config import get_config, cdiv, round_up

_DUMMY = np.zeros((0,), np.int32)  # local plans don't carry scatter maps


def _chunk_plan_arrays(rows, cols, m_local, k_local, blocksize, ell_width=None):
    """Inspect one chunk's (row, col) pattern; returns raw plan arrays in
    chunk-entry order plus the achieved ELL width."""
    indptr = np.zeros(m_local + 1, dtype=np.int64)
    np.add.at(indptr[1:], rows, 1)
    indptr = np.cumsum(indptr)
    block_cols, nslots, scatter_idx, width, nblocks = _inspect_numpy(
        indptr, cols, (m_local, k_local), blocksize
    )
    return block_cols, nslots, scatter_idx, width, nblocks


def _pad_width(block_cols, scatter_idx, nslots, L0, L, blocksize):
    """Re-pad chunk plan arrays from ELL width L0 to L ≥ L0."""
    bm, bk = blocksize
    nbr = block_cols.shape[0]
    if L == L0:
        return block_cols, scatter_idx
    out = np.zeros((nbr, L), dtype=np.int32)
    out[:, :L0] = block_cols
    out[:, L0:] = block_cols[:, L0 - 1 : L0]  # repeat-last padding
    brow = scatter_idx // (L0 * bm * bk)
    within = scatter_idx % (L0 * bm * bk)
    return out, (brow * (L * bm * bk) + within).astype(np.int64)


@dataclass(frozen=True)
class RowShardedPlan:
    """A row-partitioned into ndev uniform chunks of rows_per_dev rows."""

    block_cols: np.ndarray  # (ndev, nbr_l, L) int32
    nslots: np.ndarray  # (ndev, nbr_l) int32
    scatter_idx: np.ndarray  # (nnz,) int64 into the full stacked buffer
    shape: Tuple[int, int]
    blocksize: Tuple[int, int]
    ndev: int
    rows_per_dev: int
    ell_width: int

    @property
    def nbr_local(self) -> int:
        return self.rows_per_dev // self.blocksize[0]

    @property
    def slots_local(self) -> int:
        return self.nbr_local * self.ell_width

    def pack_values(self, data: jnp.ndarray) -> jnp.ndarray:
        bm, bk = self.blocksize
        flat = jnp.zeros((self.ndev * self.slots_local * bm * bk,), data.dtype)
        flat = flat.at[self.scatter_idx].set(data)
        return flat.reshape(self.ndev, self.slots_local, bm, bk)

    def local_plan(self, block_cols, nslots) -> Plan:
        return Plan(
            block_cols=block_cols,
            nslots=nslots,
            scatter_idx=_DUMMY,
            shape=(self.rows_per_dev, self.shape[1]),
            blocksize=self.blocksize,
            ell_width=self.ell_width,
            nnz=0,
            nblocks=0,
        )


def shard_plan_rows(
    a: CSR, ndev: int, blocksize: Optional[Tuple[int, int]] = None
) -> RowShardedPlan:
    """Inspect A into ndev row-chunk plans with a shared ELL width."""
    cfg = get_config()
    blocksize = blocksize or (cfg.spmm_block_m, cfg.spmm_block_k)
    bm, bk = blocksize
    m, k = a.shape
    rpd = round_up(cdiv(m, ndev), bm)
    nbr_l = rpd // bm

    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices).astype(np.int64)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    chunk_of = rows // rpd

    chunks = []
    for i in range(ndev):
        sel = np.nonzero(chunk_of == i)[0]
        bc, ns, si, w, _ = _chunk_plan_arrays(
            rows[sel] - i * rpd, indices[sel], rpd, k, blocksize
        )
        chunks.append((sel, bc, ns, si, w))

    L = max(w for *_, w in chunks)
    block_cols = np.zeros((ndev, nbr_l, L), np.int32)
    nslots = np.zeros((ndev, nbr_l), np.int32)
    gsi = np.zeros((a.nnz,), np.int64)
    slots_l = nbr_l * L
    for i, (sel, bc, ns, si, w) in enumerate(chunks):
        bc, si = _pad_width(bc, si, ns, w, L, blocksize)
        block_cols[i], nslots[i] = bc, ns
        gsi[sel] = i * slots_l * bm * bk + si
    return RowShardedPlan(
        block_cols=block_cols,
        nslots=nslots,
        scatter_idx=gsi,
        shape=(m, k),
        blocksize=blocksize,
        ndev=ndev,
        rows_per_dev=rpd,
        ell_width=L,
    )


def sharded_spmm(
    rsp: RowShardedPlan,
    data: jnp.ndarray,
    b: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    *,
    packed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """C = A @ B with A row-partitioned over `axis`, B replicated.

    Pass ``packed=rsp.pack_values(data)`` to skip the per-call value
    pack (the inspect-once/multiply-many callers, e.g.
    parallel.linalg.make_sharded_matvec, hold weights packed)."""
    m, k = rsp.shape
    n = b.shape[1]
    blocks = rsp.pack_values(data) if packed is None else packed
    # same executor dispatch as the single-chip _block_exec: resident
    # B panel when it fits the VMEM budget (B is replicated here, so
    # the panel is the full (k, bn) strip), ELL ring otherwise
    from tpusparse.kernels.tiled_spmm import (
        resident_spmm_pallas, resident_vmem_bytes)

    _probe = rsp.local_plan(rsp.block_cols[0], rsp.nslots[0])
    _bn = min(get_config().spmm_block_n, round_up(n, 128))
    _resident = (
        resident_vmem_bytes(_probe, n, b.dtype.itemsize, _bn)
        <= get_config().vmem_limit_bytes
    )

    def body(bc, ns, blk, b_full):
        plan = rsp.local_plan(bc[0], ns[0])
        if _resident:
            return resident_spmm_pallas(plan, blk[0], b_full)[None]
        return tiled_spmm_pallas(plan, blk[0], b_full)[None]

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
    )(jnp.asarray(rsp.block_cols), jnp.asarray(rsp.nslots), blocks, b)
    return out.reshape(rsp.ndev * rsp.rows_per_dev, n)[:m]


@dataclass(frozen=True)
class HaloShardedPlan:
    """A partitioned into (row chunk i, column strip j) blocks for the ring."""

    block_cols: np.ndarray  # (ndev, ndev, nbr_l, L) int32 [i, j]
    nslots: np.ndarray  # (ndev, ndev, nbr_l) int32
    scatter_idx: np.ndarray  # (nnz,) int64
    shape: Tuple[int, int]
    blocksize: Tuple[int, int]
    ndev: int
    rows_per_dev: int
    cols_per_dev: int
    ell_width: int

    @property
    def nbr_local(self) -> int:
        return self.rows_per_dev // self.blocksize[0]

    @property
    def slots_local(self) -> int:
        return self.nbr_local * self.ell_width

    def pack_values(self, data: jnp.ndarray) -> jnp.ndarray:
        bm, bk = self.blocksize
        size = self.ndev * self.ndev * self.slots_local * bm * bk
        flat = jnp.zeros((size,), data.dtype)
        flat = flat.at[self.scatter_idx].set(data)
        return flat.reshape(self.ndev, self.ndev, self.slots_local, bm, bk)

    def local_plan(self, block_cols, nslots) -> Plan:
        return Plan(
            block_cols=block_cols,
            nslots=nslots,
            scatter_idx=_DUMMY,
            shape=(self.rows_per_dev, self.cols_per_dev),
            blocksize=self.blocksize,
            ell_width=self.ell_width,
            nnz=0,
            nblocks=0,
        )


def shard_plan_2d(
    a: CSR, ndev: int, blocksize: Optional[Tuple[int, int]] = None
) -> HaloShardedPlan:
    cfg = get_config()
    blocksize = blocksize or (cfg.spmm_block_m, cfg.spmm_block_k)
    bm, bk = blocksize
    m, k = a.shape
    rpd = round_up(cdiv(m, ndev), bm)
    cpd = round_up(cdiv(k, ndev), bk)
    nbr_l = rpd // bm

    indptr = np.asarray(a.indptr)
    cols = np.asarray(a.indices).astype(np.int64)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    ci = rows // rpd
    cj = cols // cpd

    raw = {}
    widths = []
    for i in range(ndev):
        for j in range(ndev):
            sel = np.nonzero((ci == i) & (cj == j))[0]
            bc, ns, si, w, _ = _chunk_plan_arrays(
                rows[sel] - i * rpd, cols[sel] - j * cpd, rpd, cpd, blocksize
            )
            raw[(i, j)] = (sel, bc, ns, si, w)
            widths.append(w)

    L = max(widths)
    slots_l = nbr_l * L
    block_cols = np.zeros((ndev, ndev, nbr_l, L), np.int32)
    nslots = np.zeros((ndev, ndev, nbr_l), np.int32)
    gsi = np.zeros((a.nnz,), np.int64)
    for (i, j), (sel, bc, ns, si, w) in raw.items():
        bc, si = _pad_width(bc, si, ns, w, L, blocksize)
        block_cols[i, j], nslots[i, j] = bc, ns
        gsi[sel] = (i * ndev + j) * slots_l * bm * bk + si
    return HaloShardedPlan(
        block_cols=block_cols,
        nslots=nslots,
        scatter_idx=gsi,
        shape=(m, k),
        blocksize=blocksize,
        ndev=ndev,
        rows_per_dev=rpd,
        cols_per_dev=cpd,
        ell_width=L,
    )


def halo_spmm(
    hsp: HaloShardedPlan,
    data: jnp.ndarray,
    b: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """Ring SpMM: A 2-D partitioned over `axis`, B row-sharded over `axis`.

    Device i starts holding B strip i; each of ndev steps computes the
    partial product A[i, j] @ B[j] for the currently-held strip j=(i+s)
    and rotates the strip one hop around the ring (lax.ppermute).
    """
    m, k = hsp.shape
    n = b.shape[1]
    ndev = hsp.ndev
    kp = ndev * hsp.cols_per_dev
    if b.shape[0] != kp:
        b = jnp.pad(b, ((0, kp - k), (0, 0)))
    blocks = hsp.pack_values(data)
    perm = [(d, (d - 1) % ndev) for d in range(ndev)]

    # per-step executor: the ring's falloff at high ndev is B/C
    # re-traffic per step (measured r3: per-step ELL widths are within
    # one slot of the global width, so padding is NOT the cost — each
    # step re-fetches B tiles per slot and re-writes C). When the local
    # B strip fits the VMEM budget, the resident executor caches it
    # once per step and per-slot work drops to SMEM+VMEM+MXU
    # (bitwise-identical output). The choice is plan-static, so the
    # SPMD program stays uniform across devices.
    from tpusparse.kernels.tiled_spmm import (
        resident_spmm_pallas, resident_vmem_bytes)

    probe_plan = hsp.local_plan(hsp.block_cols[0, 0], hsp.nslots[0, 0])
    _bn = min(get_config().spmm_block_n, round_up(n, 128))
    use_resident = (
        resident_vmem_bytes(probe_plan, n, b.dtype.itemsize, _bn)
        <= get_config().vmem_limit_bytes
    )

    def body(bc, ns, blk, b_strip):
        me = lax.axis_index(axis)
        bc, ns, blk, b_strip = bc[0], ns[0], blk[0], b_strip

        def compute(s, acc, b_cur):
            j = (me + s) % ndev
            plan = hsp.local_plan(
                lax.dynamic_index_in_dim(bc, j, 0, keepdims=False),
                lax.dynamic_index_in_dim(ns, j, 0, keepdims=False),
            )
            vals = lax.dynamic_index_in_dim(blk, j, 0, keepdims=False)
            if use_resident:
                return acc + resident_spmm_pallas(plan, vals, b_cur)
            return acc + tiled_spmm_pallas(plan, vals, b_cur)

        def step(s, carry):
            acc, b_cur = carry
            return compute(s, acc, b_cur), lax.ppermute(b_cur, axis, perm)

        acc = jnp.zeros((hsp.rows_per_dev, n), jnp.float32)
        # last chunk peeled: its rotation result would be discarded, so a
        # full-trip loop paid one useless strip transfer per call
        acc, b_last = lax.fori_loop(0, ndev - 1, step, (acc, b_strip))
        acc = compute(ndev - 1, acc, b_last)
        return acc[None].astype(b_strip.dtype)

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis, None)),
        out_specs=P(axis),
    )(
        jnp.asarray(hsp.block_cols),
        jnp.asarray(hsp.nslots),
        blocks,
        b,
    )
    return out.reshape(ndev * hsp.rows_per_dev, n)[:m]
