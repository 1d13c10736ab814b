"""Beyond the reference (single-GPU only, SURVEY.md §2.5): sharding the
sparse operator over a device mesh.

Runs on 8 virtual CPU devices so it works anywhere; on a real slice the
SAME code shards over TPU chips (that is the point of jax.sharding).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import tpusparse as ts
from tpusparse.parallel import make_mesh, shard_plan_rows, sharded_spmm
from tpusparse.parallel.linalg import sharded_cg

assert len(jax.devices()) >= 8, "needs the 8-virtual-device CPU mesh"
mesh = make_mesh((8,), ("model",))
rng = np.random.default_rng(0)

# row-partitioned SpMM: A sharded, B replicated, zero forward comm
A = ts.random_csr(0, (256, 256), 0.05)
B = jnp.asarray(rng.normal(size=(256, 32)).astype(np.float32))
rsp = shard_plan_rows(A, 8, blocksize=(8, 8))
y = sharded_spmm(rsp, A.data, B, mesh)
ref = np.asarray(ts.spmm_reference(A, B), np.float64)
err = np.abs(np.asarray(y, np.float64) - ref).max() / np.abs(ref).max()
assert err < 1e-4, err
print(f"  sharded_spmm over 8 devices: rel err {err:.2e}")

# distributed CG: the matvec runs inside shard_map every iteration
S = ts.sp_add(A, ts.transpose_csr(A))
spd = ts.sp_add(S, ts.linalg.speye(256), 1.0, 30.0)
b = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
x, _ = sharded_cg(spd, b, mesh, blocksize=(8, 8), tol=1e-8, maxiter=200)
r = np.asarray(ts.spmm_reference(spd, x[:, None]))[:, 0] - np.asarray(b)
res = np.linalg.norm(r) / np.linalg.norm(np.asarray(b))
assert res < 1e-4, res
print(f"  sharded_cg over 8 devices:   rel resid {res:.2e}")
print("06_distributed: OK  (ring-halo SpMM, dp x tp training, TP BERT, "
      "pipeline, MoE, sequence parallel: tpusparse/parallel/)")
