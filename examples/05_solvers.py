"""Beyond the reference: the solver stack (CG/GMRES + preconditioners,
eigensolvers, AMG) riding the same plan-cached SpMM."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax.numpy as jnp
import numpy as np
import scipy.sparse as ssp

import tpusparse as ts
from tpusparse.linalg import cg, eigsh_lanczos, ic_preconditioner

rng = np.random.default_rng(0)

# 2-D Poisson built with sp_kron
n1 = 24
T = ssp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n1, n1), format="csr")
I = ssp.eye(n1, format="csr")
s = lambda m: ts.CSR.from_scipy(m.tocsr().astype(np.float32))
A = ts.sp_add(ts.sp_kron(s(I), s(T)), ts.sp_kron(s(T), s(I)))
n = n1 * n1
b = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))


def resid(x):
    r = np.asarray(ts.spmm(A, x[:, None]))[:, 0] - np.asarray(b)
    return np.linalg.norm(r) / np.linalg.norm(np.asarray(b))


# NOTE: use a real tolerance — jax CG with tol=0 keeps iterating
# after exact convergence and the 0/0 step ratio turns the iterate nan.
x, _ = cg(A, b, tol=1e-7, maxiter=25)
print(f"  plain CG, 25 iters:      rel resid {resid(x):.2e}")

x, _ = cg(A, b, M=ic_preconditioner(A), tol=1e-7, maxiter=25)
print(f"  IC(0)-CG, 25 iters:      rel resid {resid(x):.2e}")

M = ts.smoothed_aggregation_setup(A, coarse_size=50)
x, _ = cg(A, b, M=M, tol=1e-7, maxiter=25)
r_amg = resid(x)
print(f"  AMG-CG, 25 iters:        rel resid {r_amg:.2e}")
assert r_amg < 1e-4

# 2-D Poisson's 2nd/3rd eigenvalues are DEGENERATE: single-vector
# Lanczos needs extra iterations to surface the second copy (the
# blocked lobpcg_topk sees both at once — see the eigsh docstring)
vals, _ = eigsh_lanczos(A, k=3, which="LA", iters=120)
ref = np.sort(np.linalg.eigvalsh(np.asarray(A.to_dense(), np.float64)))[::-1][:3]
assert np.allclose(np.asarray(vals), ref, rtol=1e-3)
print(f"  eigsh_lanczos top-3: {np.round(np.asarray(vals), 4)}")
print("05_solvers: OK")
