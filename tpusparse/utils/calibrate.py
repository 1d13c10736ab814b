"""Router cost-model self-calibration.

The 'auto' routing decision (`ops._route_spmm`) projects each kernel's
time from a handful of measured hardware constants (gather bandwidth,
per-slot executor overhead, dense MXU rate, ...). The shipped defaults
are a TPU v5e fit; on other TPU generations every one of them moves.
`tpusparse.calibrate()` re-measures them on the local chip with the
chained-iteration device timer and persists the fit, which is loaded
automatically on first routing use (lazily, so `import tpusparse` never
initializes the backend) — and only when the persisted backend /
device_kind match the running one.

This is the portable form of the reference inspector's core decision
(SURVEY.md §7.3: gather-SpMM vs block-densified SpMM per matrix) — the
decision procedure stays fixed, only the machine constants re-fit.

    import tpusparse as ts
    ts.calibrate()            # ~1-2 min on the chip; persists the fit
    ts.spmm(a, b)             # 'auto' now routes with local constants

File: $TPUSPARSE_CALIBRATION, else ~/.tpusparse/calibration.json.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

_CAL_KEYS = (
    "gather_row_bw",
    "gather_per_nnz_floor",
    "tiled_slot_overhead",
    "tiled_bw",
    "densify_per_nnz",
    "dense_fp32_flops",
    "pack_per_nnz",
    "dia_bw",
)


def calibration_path() -> str:
    return os.environ.get(
        "TPUSPARSE_CALIBRATION",
        os.path.join(os.path.expanduser("~"), ".tpusparse", "calibration.json"),
    )


def save_calibration(constants: Dict[str, float], path: Optional[str] = None) -> str:
    import jax

    path = path or calibration_path()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = _read_raw(path) or {}
    payload.update(
        constants={k: float(v) for k, v in constants.items()},
        backend=jax.default_backend(),
        device_kind=jax.devices()[0].device_kind,
    )
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    return path


def _read_raw(path: Optional[str] = None) -> Optional[dict]:
    try:
        with open(path or calibration_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _device_matches(payload: dict) -> bool:
    import jax

    fitted_on = payload.get("backend")
    if fitted_on is not None and fitted_on != jax.default_backend():
        return False
    kind = payload.get("device_kind")
    return kind is None or kind == jax.devices()[0].device_kind


def load_tile_section(section: str, path: Optional[str] = None) -> Dict[str, list]:
    """Persisted autotuned tiles {key: [ints]} from a named section
    ('gemm_tiles', 'flash_tiles', ...) — empty if absent or fitted on a
    different backend/device kind."""
    payload = _read_raw(path)
    if not payload or not _device_matches(payload):
        return {}
    tiles = payload.get(section, {})
    return {k: list(map(int, v)) for k, v in tiles.items()} if isinstance(tiles, dict) else {}


def save_tile_entry(section: str, key: str, tile, path: Optional[str] = None) -> str:
    """Record one autotuned tile under `section` (creates the file with
    the current backend stamp if needed; preserves constants and the
    other sections)."""
    import jax

    path = path or calibration_path()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = _read_raw(path) or {}
    if payload and not _device_matches(payload):
        payload = {}  # stale fit from another device — start fresh
    payload.setdefault("backend", jax.default_backend())
    payload.setdefault("device_kind", jax.devices()[0].device_kind)
    payload.setdefault(section, {})[key] = [int(x) for x in tile]
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    return path


def load_gemm_tiles(path: Optional[str] = None) -> Dict[str, list]:
    """Persisted autotuned GEMM tiles {'mxkxnxdtype': [bm, bn, bk]}."""
    return load_tile_section("gemm_tiles", path)


def save_gemm_tile(key: str, tile, path: Optional[str] = None) -> str:
    """Record one autotuned tile under 'gemm_tiles'."""
    return save_tile_entry("gemm_tiles", key, tile, path)


def load_calibration(path: Optional[str] = None) -> Optional[Dict[str, float]]:
    """Read a persisted fit; returns None if absent/invalid, or if the fit
    was taken on a different backend than the current one (a v5e fit must
    not steer routing on a CPU run or another chip generation — the exact
    mismatch calibration exists to fix). Does NOT apply it — ops.py applies
    on first routing use via `_load_calibration_into_cost`."""
    path = path or calibration_path()
    try:
        with open(path) as f:
            payload = json.load(f)
        import jax

        fitted_on = payload.get("backend")
        if fitted_on is not None and fitted_on != jax.default_backend():
            return None
        kind = payload.get("device_kind")
        if kind is not None and kind != jax.devices()[0].device_kind:
            return None
        consts = payload["constants"]
        return {k: float(consts[k]) for k in _CAL_KEYS if k in consts}
    except (OSError, KeyError, ValueError, TypeError):
        return None


def calibrate(
    save: bool = True,
    path: Optional[str] = None,
    verbose: bool = True,
) -> Dict[str, float]:
    """Measure the router cost constants on the local device and apply.

    Runs ~7 targeted measurements (each in the regime where one constant
    dominates); total ~1-2 min on a v5e including compiles. On a CPU
    backend the Pallas kernels run interpreted, so the fit would be
    meaningless — raises unless the backend is TPU.
    """
    import jax
    import jax.numpy as jnp

    from tpusparse import ops
    from tpusparse.plan import build_plan
    from tpusparse.types import DIA, CSR
    from tpusparse.utils.timing import device_time_per_iter, normalizing

    if jax.default_backend() == "cpu":
        raise RuntimeError(
            "calibrate() must run on the real TPU backend — on CPU the "
            "Pallas kernels run in interpret mode and every constant "
            "would be off by ~1000x"
        )

    TIMER = dict(iters_lo=2, iters_hi=8, repeats=2, min_delta=4e-3)
    rng = np.random.default_rng(0)
    out: Dict[str, float] = {}

    def say(msg):
        if verbose:
            print(f"[calibrate] {msg}", flush=True)

    # -- dense MXU rate ('high' 3-pass mode), 4096^2 -------------------------
    dim = 4096
    A = jnp.asarray(rng.standard_normal((dim, dim)).astype(np.float32))
    from tpusparse import dense

    t = device_time_per_iter(normalizing(lambda x: dense.matmul(x, x)), A, **TIMER)
    out["dense_fp32_flops"] = 2.0 * dim**3 / t
    say(f"dense_fp32_flops = {out['dense_fp32_flops']/1e12:.1f} TFLOP/s")

    # -- gather: wide regime -> row bandwidth; n=1 -> per-nnz floor ----------
    m = 8192
    nnz = 400_000
    r_ = rng.integers(0, m, nnz)
    c_ = rng.integers(0, m, nnz)
    order = np.lexsort((c_, r_))
    r_, c_ = r_[order], c_[order]
    keep = np.concatenate([[True], (np.diff(r_) != 0) | (np.diff(c_) != 0)])
    r_, c_ = r_[keep], c_[keep]
    nnz = r_.size
    indptr = np.zeros(m + 1, np.int64)
    np.add.at(indptr[1:], r_, 1)
    a = CSR(
        data=jnp.asarray(rng.random(nnz).astype(np.float32)),
        indices=c_.astype(np.int32),
        indptr=np.cumsum(indptr).astype(np.int32),
        shape=(m, m),
    )
    Bw = jnp.asarray(rng.standard_normal((m, 256)).astype(np.float32))

    def gstep(x):
        return normalizing(lambda v: ops.gather_spmm(a, v))(x)

    t = device_time_per_iter(gstep, Bw, **TIMER)
    out["gather_row_bw"] = nnz * 256 * 8.0 / t
    say(f"gather_row_bw = {out['gather_row_bw']/1e9:.0f} GB/s")

    Bn = jnp.asarray(rng.standard_normal((m, 1)).astype(np.float32))

    def gstep1(x):
        y = ops.gather_spmm(a, x)
        return y / (1.0 + jnp.abs(y).max())

    t = device_time_per_iter(gstep1, Bn, **TIMER)
    out["gather_per_nnz_floor"] = t / nnz
    say(f"gather_per_nnz_floor = {out['gather_per_nnz_floor']*1e9:.1f} ns/nnz")

    # -- tiled executor: slot-bound regime (128^2 blocks, n=512) -------------
    from tpusparse.kernels.tiled_spmm import tiled_spmm_pallas
    from tpusparse.utils.matrices import block_structured_csr

    bdim, bs, fill = 8192, 128, 0.15
    a_blk = CSR.from_scipy(block_structured_csr(bdim, bdim, bs, bs, fill, rng=rng))
    plan = build_plan(a_blk, (bs, bs))
    bv = plan.pack_values(a_blk.data)
    B5 = jnp.asarray(rng.standard_normal((bdim, 512)).astype(np.float32))

    def tstep(x):
        return normalizing(lambda v: tiled_spmm_pallas(plan, bv, v))(x)

    t = device_time_per_iter(tstep, B5, **TIMER)
    out["tiled_slot_overhead"] = t / plan.nblocks
    say(f"tiled_slot_overhead = {out['tiled_slot_overhead']*1e9:.0f} ns/slot")
    # bandwidth from the same run's byte count (the ELL ring's B-tile +
    # vals + C traffic); per-slot overhead and bytes bound the SAME
    # measurement, so this is the achieved-rate fit the model's max()
    # expects (whichever bound is active dominates t)
    bytes_moved = (
        plan.nblocks * (bs * 512 + bs * bs) + 2 * bdim * 512
    ) * 4.0
    out["tiled_bw"] = bytes_moved / t
    say(f"tiled_bw = {out['tiled_bw']/1e9:.0f} GB/s")

    # -- densify + pack per-nnz scatters ------------------------------------
    def dstep(x):
        a2 = CSR(data=x, indices=a.indices, indptr=a.indptr, shape=a.shape)
        d = a2.to_dense()
        # loop-carried dependency on the densified result without shape
        # games: 0*max is not foldable (max could be NaN), so XLA must
        # run the scatter every iteration
        return x * (1.0 + 0.0 * d.max())

    import jax as _jax

    t = device_time_per_iter(_jax.jit(dstep), a.data, **TIMER)
    out["densify_per_nnz"] = t / a.nnz
    say(f"densify_per_nnz = {out['densify_per_nnz']*1e9:.1f} ns/nnz")

    def pstep(x):
        p = plan.pack_values(x)
        return x * (1.0 + 0.0 * p.max())

    t = device_time_per_iter(_jax.jit(pstep), a_blk.data, **TIMER)
    out["pack_per_nnz"] = t / a_blk.nnz
    say(f"pack_per_nnz = {out['pack_per_nnz']*1e9:.1f} ns/nnz")

    # -- DIA streaming rate (5-diagonal banded SpMV) -------------------------
    md = 1_000_000
    offsets = np.array([-1000, -1, 0, 1, 1000], np.int32)
    ddata = jnp.asarray(rng.standard_normal((5, md)).astype(np.float32))
    dia = DIA(data=ddata, offsets=offsets, shape=(md, md))
    x0 = jnp.asarray(rng.standard_normal((md,)).astype(np.float32))

    def diastep(x):
        y = ops.dia_spmm(dia, x[:, None])[:, 0]
        return y / (1.0 + jnp.abs(y).max())

    t = device_time_per_iter(diastep, x0, **TIMER)
    out["dia_bw"] = 5 * md * 3 * 4.0 / t
    say(f"dia_bw = {out['dia_bw']/1e9:.0f} GB/s")

    ops.set_cost_constants(**out)
    if save:
        p = save_calibration(out, path)
        say(f"saved to {p}")
    return out
