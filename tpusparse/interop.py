"""Interop: convert between tpusparse arrays and the formats a reference
user already holds — torch tensors (dense / sparse COO / CSR / BSR),
scipy.sparse matrices, and ``jax.experimental.sparse`` BCOO/BCSR.

The reference extracts CSR properties from torch sparse tensors at every
call (`get_sparse_tensor_properties`, reference matmuls.py:178-187, with
per-call ``.cuda()`` copies and int32 casts); here conversion is an
explicit one-time step at the framework boundary — patterns land on the
host (numpy, trace-time constants, ready for the plan inspectors) and
values land wherever JAX puts them.

All third-party imports are lazy: importing tpusparse never pulls in
torch, and each converter raises a clear error if its library is absent.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpusparse.types import BSR, COO, CSR, DIA, coo_to_csr, csr_to_coo

_INT = np.int32


def _as_host(x) -> np.ndarray:
    """Torch tensor / jax array / numpy → host numpy (detached)."""
    if hasattr(x, "detach"):  # torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _as_host_w(x) -> np.ndarray:
    """Like _as_host but guaranteed writable (torch.from_numpy refuses
    the read-only buffers jax arrays expose)."""
    out = _as_host(x)
    return out if out.flags.writeable else out.copy()


# ---------------------------------------------------------------------------
# torch
# ---------------------------------------------------------------------------


def _check_block_multiple(a: BSR, opname: str):
    bm, bn = a.blocksize
    if a.shape[0] % bm or a.shape[1] % bn:
        raise ValueError(
            f"{opname}: torch/scipy BSR need shape to be a block multiple; "
            f"got {a.shape} with blocks {a.blocksize} (tpusparse BSR pads "
            "logically — convert via bsr_to_csr first)"
        )


def from_torch(t):
    """torch tensor → tpusparse array.

    Layout mapping: ``strided`` (dense) → CSR via ``CSR.from_dense``;
    ``sparse_coo`` → COO; ``sparse_csr`` → CSR; ``sparse_bsr`` → BSR.
    2-D only (the framework's sparse types are 2-D; batch torch tensors
    should be converted per-matrix and combined with ``block_diag`` /
    ``vstack``).
    """
    import torch

    if not isinstance(t, torch.Tensor):
        raise TypeError(f"from_torch expects a torch.Tensor, got {type(t)}")
    if t.dim() != 2:
        raise ValueError(f"from_torch supports 2-D tensors, got shape {tuple(t.shape)}")
    layout = t.layout
    if layout == torch.strided:
        return CSR.from_dense(jnp.asarray(_as_host(t)))
    if layout == torch.sparse_coo:
        tc = t.coalesce()
        idx = _as_host(tc.indices())
        return COO(
            data=jnp.asarray(_as_host(tc.values())),
            row=idx[0].astype(_INT),
            col=idx[1].astype(_INT),
            shape=tuple(int(s) for s in tc.shape),
        )
    if layout == torch.sparse_csr:
        return CSR(
            data=jnp.asarray(_as_host(t.values())),
            indices=_as_host(t.col_indices()).astype(_INT),
            indptr=_as_host(t.crow_indices()).astype(_INT),
            shape=tuple(int(s) for s in t.shape),
        )
    if layout == torch.sparse_bsr:
        vals = _as_host(t.values())  # (nblocks, bm, bn)
        return BSR(
            data=jnp.asarray(vals),
            indices=_as_host(t.col_indices()).astype(_INT),
            indptr=_as_host(t.crow_indices()).astype(_INT),
            shape=tuple(int(s) for s in t.shape),
            blocksize=(int(vals.shape[1]), int(vals.shape[2])),
        )
    raise ValueError(f"unsupported torch layout {layout}")


def to_torch(a):
    """tpusparse array → torch sparse tensor of the matching layout
    (CSR → sparse_csr, COO → sparse_coo, BSR → sparse_bsr)."""
    import torch

    if isinstance(a, CSR):
        return torch.sparse_csr_tensor(
            torch.from_numpy(_as_host_w(a.indptr).astype(np.int64)),
            torch.from_numpy(_as_host_w(a.indices).astype(np.int64)),
            torch.from_numpy(_as_host_w(a.data)),
            size=a.shape,
        )
    if isinstance(a, COO):
        idx = np.stack([_as_host_w(a.row), _as_host_w(a.col)]).astype(np.int64)
        return torch.sparse_coo_tensor(
            torch.from_numpy(idx),
            torch.from_numpy(_as_host_w(a.data)),
            size=a.shape,
        ).coalesce()
    if isinstance(a, BSR):
        _check_block_multiple(a, "to_torch")
        return torch.sparse_bsr_tensor(
            torch.from_numpy(_as_host_w(a.indptr).astype(np.int64)),
            torch.from_numpy(_as_host_w(a.indices).astype(np.int64)),
            torch.from_numpy(_as_host_w(a.data)),
            size=a.shape,
        )
    raise TypeError(f"to_torch expects CSR/COO/BSR, got {type(a)}")


# ---------------------------------------------------------------------------
# scipy (module-level generic; CSR also has .from_scipy/.to_scipy methods)
# ---------------------------------------------------------------------------


def from_scipy(sp):
    """scipy.sparse matrix → CSR (csr/csc/coo/bsr/dia all accepted;
    dia keeps its diagonal structure as DIA; bsr keeps
    its block structure as BSR)."""
    import scipy.sparse as ssp

    if isinstance(sp, ssp.bsr_matrix):
        sp.sort_indices()
        return BSR(
            data=jnp.asarray(sp.data),
            indices=sp.indices.astype(_INT),
            indptr=sp.indptr.astype(_INT),
            shape=tuple(int(s) for s in sp.shape),
            blocksize=(int(sp.blocksize[0]), int(sp.blocksize[1])),
        )
    if isinstance(sp, ssp.dia_matrix):
        return DIA.from_scipy(sp)
    if isinstance(sp, ssp.coo_matrix):
        return COO(
            data=jnp.asarray(sp.data),
            row=sp.row.astype(_INT),
            col=sp.col.astype(_INT),
            shape=tuple(int(s) for s in sp.shape),
        )
    return CSR.from_scipy(sp.tocsr())


def to_scipy(a):
    """tpusparse array → the matching scipy.sparse matrix."""
    import scipy.sparse as ssp

    if isinstance(a, CSR):
        return a.to_scipy()
    if isinstance(a, DIA):
        return a.to_scipy()
    if isinstance(a, COO):
        return ssp.coo_matrix(
            (_as_host(a.data), (_as_host(a.row), _as_host(a.col))),
            shape=a.shape,
        )
    if isinstance(a, BSR):
        _check_block_multiple(a, "to_scipy")
        return ssp.bsr_matrix(
            (_as_host(a.data), _as_host(a.indices), _as_host(a.indptr)),
            shape=a.shape,
            blocksize=a.blocksize,
        )
    raise TypeError(f"to_scipy expects CSR/COO/BSR, got {type(a)}")


# ---------------------------------------------------------------------------
# jax.experimental.sparse (BCOO / BCSR)
# ---------------------------------------------------------------------------


def from_bcoo(m) -> COO:
    """jax.experimental.sparse.BCOO (2-D, n_batch=0) → COO.

    Note BCOO may carry duplicate / padded entries (e.g. after autodiff);
    they are summed into canonical form first.
    """
    from jax.experimental import sparse as jsparse

    if not isinstance(m, jsparse.BCOO):
        raise TypeError(f"from_bcoo expects BCOO, got {type(m)}")
    if m.ndim != 2 or m.n_batch or m.n_dense:
        raise ValueError(
            f"from_bcoo supports plain 2-D BCOO, got ndim={m.ndim} "
            f"n_batch={m.n_batch} n_dense={m.n_dense}"
        )
    m = m.sum_duplicates()
    idx = _as_host(m.indices)
    # canonical row-major order (sum_duplicates sorts, but be explicit)
    order = np.lexsort((idx[:, 1], idx[:, 0]))
    return COO(
        data=jnp.asarray(_as_host(m.data)[order]),
        row=idx[order, 0].astype(_INT),
        col=idx[order, 1].astype(_INT),
        shape=tuple(int(s) for s in m.shape),
    )


def to_bcoo(a):
    """CSR/COO → jax.experimental.sparse.BCOO (shares value buffers)."""
    from jax.experimental import sparse as jsparse

    if isinstance(a, CSR):
        a = csr_to_coo(a)
    if not isinstance(a, COO):
        raise TypeError(f"to_bcoo expects CSR/COO, got {type(a)}")
    idx = jnp.stack(
        [jnp.asarray(a.row, jnp.int32), jnp.asarray(a.col, jnp.int32)], axis=1
    )
    return jsparse.BCOO(
        (a.data, idx),
        shape=a.shape,
        indices_sorted=True,
        unique_indices=True,
    )


def from_bcsr(m) -> CSR:
    """jax.experimental.sparse.BCSR (2-D) → CSR."""
    from jax.experimental import sparse as jsparse

    if not isinstance(m, jsparse.BCSR):
        raise TypeError(f"from_bcsr expects BCSR, got {type(m)}")
    if m.ndim != 2:
        raise ValueError(f"from_bcsr supports 2-D BCSR, got ndim={m.ndim}")
    return CSR(
        data=m.data,
        indices=_as_host(m.indices).astype(_INT),
        indptr=_as_host(m.indptr).astype(_INT),
        shape=tuple(int(s) for s in m.shape),
    )


def to_bcsr(a: CSR):
    """CSR → jax.experimental.sparse.BCSR (shares the value buffer)."""
    from jax.experimental import sparse as jsparse

    if isinstance(a, COO):
        a = coo_to_csr(a)
    if not isinstance(a, CSR):
        raise TypeError(f"to_bcsr expects CSR, got {type(a)}")
    return jsparse.BCSR(
        (
            a.data,
            jnp.asarray(a.indices, jnp.int32),
            jnp.asarray(a.indptr, jnp.int32),
        ),
        shape=a.shape,
    )
