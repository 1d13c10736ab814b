"""Tests for aux subsystems: checkpoint/resume, profiling, config, data.

These cover capability the reference lacks entirely (SURVEY.md §5.1-5.5:
no checkpointing, ad hoc timing, compile-time #define config).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import tpusparse as ts
from tpusparse.utils.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from tpusparse.utils.profiling import kernel_report, measured_roofline
from tpusparse.plan import build_plan


def _tree_close(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip(tmp_path, rng):
    state = {
        "params": {"w": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))},
        "step": jnp.asarray(7),
    }
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 7, state)
    restored = restore_checkpoint(d)
    _tree_close(restored, state)


def test_checkpoint_manager_retention_and_latest(tmp_path):
    d = str(tmp_path / "ckpt")
    with CheckpointManager(d, max_to_keep=2) as mgr:
        for step in (1, 2, 3):
            assert mgr.save(step, {"x": jnp.asarray(float(step))}, force=True)
        mgr.wait_until_finished()
        assert mgr.latest_step() == 3
        assert mgr.all_steps() == [2, 3]
        assert float(mgr.restore()["x"]) == 3.0
        assert float(mgr.restore(2)["x"]) == 2.0


def test_checkpoint_restore_missing_raises(tmp_path):
    with CheckpointManager(str(tmp_path / "empty")) as mgr:
        with pytest.raises(FileNotFoundError):
            mgr.restore()


def test_checkpoint_training_resume(tmp_path, rng):
    """Save mid-training, restore, and verify identical continuation."""
    from tpusparse.models.mlp import MnistNet, make_train_state, train_step

    model = MnistNet(variant="sparse", sparse_density=0.2)
    params, tx, opt_state = make_train_state(
        model, jax.random.PRNGKey(0), input_shape=(8, 784)
    )
    step = jax.jit(train_step(model, tx))
    x = jnp.asarray(rng.normal(size=(8, 784)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=(8,)).astype(np.int32))

    params, opt_state, _ = step(params, opt_state, x, y)
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 1, {"params": params, "opt_state": opt_state})

    # continue directly
    p2, o2, loss_direct = step(params, opt_state, x, y)
    # continue from restore (template restores matching dtypes/structure)
    restored = restore_checkpoint(
        d, template={"params": params, "opt_state": opt_state}
    )
    p3, o3, loss_resumed = step(restored["params"], restored["opt_state"], x, y)
    assert float(loss_direct) == pytest.approx(float(loss_resumed), rel=1e-6)
    _tree_close(p2, p3)


def test_kernel_report_keys(rng):
    a = ts.random_csr(0, (256, 256), 0.05)
    plan = build_plan(a, blocksize=(8, 128))
    rep = kernel_report(plan, n_cols=64)
    for key in (
        "density",
        "nnz",
        "block_fill",
        "ell_pad_overhead",
        "arithmetic_intensity",
        "projected_time_s",
        "projected_nnz_per_s",
        "bound",
    ):
        assert key in rep
    assert rep["nnz"] == a.nnz
    assert 0 < rep["density"] < 1


def test_measured_roofline(rng):
    a = ts.random_csr(1, (128, 128), 0.1)
    plan = build_plan(a, blocksize=(8, 128))
    bv = plan.pack_values(a.data)
    b = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))

    from tpusparse.kernels.tiled_spmm import tiled_spmm_pallas
    from tpusparse.utils.timing import normalizing

    def step(x):
        vals, bb = x
        return vals, normalizing(lambda v: tiled_spmm_pallas(plan, vals, v))(bb)

    rep = measured_roofline(plan, step, (bv, b), n_cols=64)
    assert rep["sec_per_iter"] > 0
    assert rep["achieved_gflops"] > 0
    assert np.isfinite(rep["sol_fraction"])


def test_profiler_trace_writes(tmp_path):
    from tpusparse.utils.profiling import annotate, trace

    logdir = str(tmp_path / "prof")
    with trace(logdir):
        with annotate("test_span"):
            jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # a plugins/profile/<run> directory with at least one artifact
    found = []
    for root, _, files in os.walk(logdir):
        found += files
    assert found, "profiler trace produced no files"


# -- debug / validation layer (reference Utilities.cuh + check_equal analog) --

def test_validate_csr_catches_malformed():
    from tpusparse.utils.debug import validate_csr

    good = ts.random_csr(0, (8, 12), 0.3)
    validate_csr(good)  # no raise

    bad_idx = ts.CSR(
        data=good.data,
        indices=np.full_like(np.asarray(good.indices), 99),
        indptr=np.asarray(good.indptr),
        shape=good.shape,
    )
    with pytest.raises(ValueError, match="out of range"):
        validate_csr(bad_idx)

    ip = np.asarray(good.indptr).copy()
    ip[-1] += 1
    with pytest.raises(ValueError, match="nnz"):
        validate_csr(
            ts.CSR(good.data, np.asarray(good.indices), ip, good.shape)
        )


def test_checkify_check_csr_inside_jit():
    from tpusparse.utils.debug import check_csr, checked

    a = ts.random_csr(1, (8, 12), 0.3)

    @checked
    @jax.jit
    def f(data, indices, indptr):
        a2 = ts.CSR(data=data, indices=indices, indptr=indptr, shape=(8, 12))
        check_csr(a2)
        return ts.spmm_reference(a2, jnp.ones((12, 4)))

    f(a.data, jnp.asarray(a.indices), jnp.asarray(a.indptr))  # passes

    bad = jnp.full_like(jnp.asarray(a.indices), 99)
    with pytest.raises(Exception, match="out of range"):
        f(a.data, bad, jnp.asarray(a.indptr))


def test_debug_checks_config_flag():
    from tpusparse.utils.config import set_config

    a = ts.random_csr(2, (8, 12), 0.3)
    bad = ts.CSR(
        data=a.data,
        indices=np.full_like(np.asarray(a.indices), 99),
        indptr=np.asarray(a.indptr),
        shape=a.shape,
    )
    set_config(debug_checks=True)
    try:
        with pytest.raises(ValueError, match="out of range"):
            ts.spmm(bad, jnp.ones((12, 4)), method="reference")
    finally:
        set_config(debug_checks=False)


def test_compare_report():
    from tpusparse.utils.debug import compare_report

    e = np.array([[1.0, 2.0], [0.0, 4.0]])
    rep = compare_report(e, e)
    assert rep["allclose"] == 1.0 and rep["mismatches"] == 0
    a = e.copy()
    a[0, 0] = 9.0
    rep = compare_report(e, a)
    assert rep["allclose"] == 0.0 and rep["mismatches"] == 1
    assert rep["max_abs_err"] == pytest.approx(8.0)
    assert compare_report(e, np.zeros((3, 3)))["shape_mismatch"] == 1.0


# -- transient-failure retry (reference has no failure handling, §5.3) --------

def test_with_retries_retries_transient_then_succeeds():
    from tpusparse.utils.retry import with_retries

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("Backend 'axon' is not in the list of known backends")
        return 42

    assert with_retries(flaky, retries=3, backoff_s=0.0)() == 42
    assert calls["n"] == 3


def test_with_retries_permanent_raises_immediately():
    from tpusparse.utils.retry import with_retries

    calls = {"n": 0}

    def oom():
        calls["n"] += 1
        raise RuntimeError("Ran out of memory in memory space vmem")

    with pytest.raises(RuntimeError, match="Ran out"):
        with_retries(oom, retries=5, backoff_s=0.0)()
    assert calls["n"] == 1


def test_with_retries_exhausts():
    from tpusparse.utils.retry import with_retries

    def always():
        raise RuntimeError("HTTP 500: tpu_compile_helper")

    with pytest.raises(RuntimeError, match="HTTP 500"):
        with_retries(always, retries=2, backoff_s=0.0)()
