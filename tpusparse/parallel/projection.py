"""Quantitative multi-chip scaling projection for the sharded SpMM paths.

Real pod slices are not available in this environment (BASELINE.json
configs[4] asks for ≥80% nnz/s scaling efficiency at 2-8 chips), so this
module makes the claim FALSIFIABLE before hardware arrives:

  * the COMPUTE side of each projection comes from the same measured
    cost constants the single-chip router uses (`ops.get_cost_constants`,
    re-fit on any chip via `tpusparse.calibrate()`), applied to the
    ACTUAL per-device plan arrays (real ELL widths, real padding — not
    idealized nnz/ndev), so per-device load imbalance is captured;
  * the COMM side counts exactly the bytes the shard_map program moves
    (ring `ppermute` strips for `halo_spmm`; nothing in steady-state
    `sharded_spmm`), at a stated interconnect bandwidth (v5e ICI
    ~1.6 Tbit/s off-chip per direction ≈ 180 GB/s effective; DCN ~25 GB/s);
  * `count_ppermute_bytes` traces the REAL shard_map program and sums
    ppermute operand bytes × loop trip counts from the jaxpr —
    tests assert the model's comm volume equals what the program moves,
    so the projection cannot silently drift from the implementation.

No reference analog (single-GPU, SURVEY.md §2.5); the design target is
BASELINE.json configs[4].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse import ops
from tpusparse.types import CSR

__all__ = [
    "ScalingProjection",
    "project_sharded_spmm",
    "project_halo_spmm",
    "projection_table",
    "count_ppermute_bytes",
]

# v5e interconnect bandwidths (per direction, effective). ICI: 4 links
# x 400 Gbit/s aggregate ~1.6 Tbit/s; we assume a ring uses one link pair
# per neighbor at ~180 GB/s effective. DCN (multi-slice) ~25 GB/s.
ICI_BW = 180e9
DCN_BW = 25e9


@dataclass(frozen=True)
class ScalingProjection:
    ndev: int
    t_compute_s: float       # critical-path (max-over-devices) kernel time
    t_comm_s: float          # serialized collective time on the same path
    t_total_s: float         # max(compute, comm) per overlapped step, summed
    comm_bytes_per_dev: int  # bytes each device sends through the ring
    efficiency: float        # t(1 dev) / (ndev * t_total)

    def row(self) -> str:
        return (
            f"{self.ndev:>4d}  {self.t_compute_s*1e3:9.3f}  "
            f"{self.t_comm_s*1e3:8.3f}  {self.t_total_s*1e3:8.3f}  "
            f"{self.comm_bytes_per_dev/1e6:9.2f}  {self.efficiency*100:6.1f}%"
        )


def _chunk_time(nslots_sum: int, nbr: int, L: int, bm: int, bk: int,
                n: int, c: dict, kp: int = 0) -> float:
    """Projected executor time for one device chunk — the same
    max(bandwidth, per-slot) model `ops._route_spmm` uses, applied to
    the chunk's REAL slot counts. When `kp` (the chunk's padded K
    extent) is given and the B panel fits the VMEM budget, the resident
    executor's traffic model applies (panel DMA'd once per n-tile
    instead of a B tile per slot) — matching halo_spmm's per-step
    dispatch."""
    from tpusparse.utils.config import get_config

    ntile = max(n // 512, 1)
    bn = min(512, n)
    cfg = get_config()
    resident = (
        kp > 0
        and kp * bn * 4 + 2 * L * bm * bk * 4 + 2 * bm * bn * 4
        <= cfg.vmem_limit_bytes
    )
    if resident:
        bytes_moved = (
            kp * bn * 4.0 * ntile            # panel per n-tile
            + nslots_sum * bm * bk * 4.0     # values once
            + 2.0 * nbr * bm * n * 4.0       # C read+write
        )
    else:
        bytes_moved = (
            nslots_sum * (bk * bn + bm * bk) * 4.0
        ) * ntile + 2.0 * nbr * bm * n * 4.0
    return max(
        bytes_moved / c["tiled_bw"],
        nslots_sum * c["tiled_slot_overhead"] * ntile,
    )


def _single_dev_time(a: CSR, n: int, blocksize, c: dict) -> float:
    """Reference point: the whole matrix on one device, same model."""
    from tpusparse.parallel.spmm import shard_plan_rows

    rsp1 = shard_plan_rows(a, 1, blocksize)
    ns = int(rsp1.nslots.sum())
    kp = -(-a.shape[1] // rsp1.blocksize[1]) * rsp1.blocksize[1]
    return _chunk_time(
        ns, rsp1.nbr_local, rsp1.ell_width, *rsp1.blocksize, n, c, kp=kp
    )


def project_sharded_spmm(
    a: CSR,
    n: int,
    ndevs: Sequence[int] = (2, 4, 8),
    blocksize: Tuple[int, int] | None = None,
) -> List[ScalingProjection]:
    """Projection for `sharded_spmm` (A row-sharded, B replicated):
    zero steady-state communication; efficiency is limited purely by
    row-chunk load imbalance (real per-chunk slot counts)."""
    from tpusparse.parallel.spmm import shard_plan_rows

    c = ops.get_cost_constants()
    t1 = _single_dev_time(a, n, blocksize, c)
    out = []
    for ndev in ndevs:
        rsp = shard_plan_rows(a, ndev, blocksize)
        bm, bk = rsp.blocksize
        kp = -(-a.shape[1] // bk) * bk  # B replicated: full-k panel
        t_max = max(
            _chunk_time(
                int(rsp.nslots[i].sum()), rsp.nbr_local, rsp.ell_width,
                bm, bk, n, c, kp=kp,
            )
            for i in range(ndev)
        )
        out.append(
            ScalingProjection(
                ndev=ndev,
                t_compute_s=t_max,
                t_comm_s=0.0,
                t_total_s=t_max,
                comm_bytes_per_dev=0,
                efficiency=t1 / (ndev * t_max),
            )
        )
    return out


def halo_comm_bytes_per_dev(hsp, n: int, dtype_bytes: int = 4) -> int:
    """Bytes each device sends through the ring in one halo_spmm call:
    (ndev - 1) ppermute hops of its (cols_per_dev, n) B strip (the last
    rotation is peeled off in halo_spmm — no wasted trip)."""
    return (hsp.ndev - 1) * hsp.cols_per_dev * n * dtype_bytes


def project_halo_spmm(
    a: CSR,
    n: int,
    ndevs: Sequence[int] = (2, 4, 8),
    blocksize: Tuple[int, int] | None = None,
    ici_bw: float = ICI_BW,
) -> List[ScalingProjection]:
    """Projection for `halo_spmm` (A 2-D partitioned, B ring-rotated).

    Each of the ndev steps overlaps one chunk multiply with one strip
    rotation (they have no data dependence within the step), so the step
    time is max(compute_step, strip/ici_bw); the critical path sums the
    per-step maxima of the slowest device."""
    from tpusparse.parallel.spmm import shard_plan_2d

    c = ops.get_cost_constants()
    t1 = _single_dev_time(a, n, blocksize, c)
    out = []
    for ndev in ndevs:
        hsp = shard_plan_2d(a, ndev, blocksize)
        bm, bk = hsp.blocksize
        strip_t = hsp.cols_per_dev * n * 4.0 / ici_bw
        t_total = 0.0
        t_compute = 0.0
        for s in range(ndev):
            # step s: device i multiplies chunk (i, (i+s) % ndev)
            step_compute = max(
                _chunk_time(
                    int(hsp.nslots[i, (i + s) % ndev].sum()),
                    hsp.nbr_local, hsp.ell_width, bm, bk, n, c,
                    kp=hsp.cols_per_dev,
                )
                for i in range(ndev)
            )
            t_compute += step_compute
            # the last step has no rotation (peeled)
            t_total += max(step_compute, strip_t if s < ndev - 1 else 0.0)
        out.append(
            ScalingProjection(
                ndev=ndev,
                t_compute_s=t_compute,
                t_comm_s=(ndev - 1) * strip_t,
                t_total_s=t_total,
                comm_bytes_per_dev=halo_comm_bytes_per_dev(hsp, n),
                efficiency=t1 / (ndev * t_total),
            )
        )
    return out


def projection_table(projs: List[ScalingProjection], title: str) -> str:
    head = (
        f"{title}\n"
        "ndev  compute_ms   comm_ms  total_ms   MB/dev   eff\n"
    )
    return head + "\n".join(p.row() for p in projs)


# ---------------------------------------------------------------------------
# Structural validation: count the bytes the REAL program moves
# ---------------------------------------------------------------------------


def count_ppermute_bytes(fn, *args) -> int:
    """Total bytes of ppermute traffic per device in `fn(*args)`.

    Traces fn to a jaxpr and walks it recursively (shard_map bodies,
    scan/while bodies, pjit calls), summing ppermute operand sizes —
    multiplied by the static trip count of any enclosing scan. Used by
    tests to pin the projection's comm model to the implementation."""
    jaxpr = jax.make_jaxpr(fn)(*args)

    def walk(jx, mult: int) -> int:
        total = 0
        for eqn in jx.eqns:
            prim = eqn.primitive.name
            if prim == "ppermute":
                for v in eqn.invars:
                    aval = v.aval
                    total += mult * int(
                        np.prod(aval.shape) * aval.dtype.itemsize
                    )
                continue
            m = mult
            if prim == "scan":
                m *= int(eqn.params.get("length", 1))
            for key in ("jaxpr", "call_jaxpr", "body_jaxpr", "cond_jaxpr"):
                sub = eqn.params.get(key)
                if sub is None:
                    continue
                inner = sub.jaxpr if hasattr(sub, "jaxpr") else sub
                total += walk(inner, m)
        return total

    return walk(jaxpr.jaxpr, 1)
