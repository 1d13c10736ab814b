"""Router self-calibration tests (constants plumbing + persistence).

The actual chip measurement (`tpusparse.calibrate()`) only runs on a real
TPU (it raises on CPU, where interpret-mode timings would be ~1000x off);
these tests cover the constants round-trip, persistence format, import
loading, and that routing honors overridden constants.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

import tpusparse as ts
from tpusparse import ops
from tpusparse.utils.calibrate import (
    _CAL_KEYS,
    load_calibration,
    save_calibration,
)


@pytest.fixture
def restore_constants():
    saved = ops.get_cost_constants()
    yield
    ops.set_cost_constants(**saved)


def test_set_get_roundtrip(restore_constants):
    before = ops.get_cost_constants()
    after = ops.set_cost_constants(tiled_bw=123e9)
    assert after["tiled_bw"] == 123e9
    assert ops.get_cost_constants()["tiled_bw"] == 123e9
    # other keys untouched
    assert after["dia_bw"] == before["dia_bw"]


def test_set_unknown_key_raises():
    with pytest.raises(KeyError, match="unknown cost constant"):
        ops.set_cost_constants(warp_size=32)


def test_save_load_roundtrip(tmp_path):
    consts = {k: float(i + 1) for i, k in enumerate(_CAL_KEYS)}
    p = str(tmp_path / "cal.json")
    save_calibration(consts, p)
    back = load_calibration(p)
    assert back == consts
    with open(p) as f:
        payload = json.load(f)
    assert "backend" in payload


def test_load_missing_returns_none(tmp_path):
    assert load_calibration(str(tmp_path / "nope.json")) is None
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert load_calibration(str(bad)) is None


def test_calibration_env_path(tmp_path, monkeypatch):
    p = str(tmp_path / "env_cal.json")
    monkeypatch.setenv("TPUSPARSE_CALIBRATION", p)
    from tpusparse.utils.calibrate import calibration_path

    assert calibration_path() == p


def test_import_loader_applies_fit(tmp_path, monkeypatch, restore_constants):
    p = str(tmp_path / "cal.json")
    save_calibration({"tiled_bw": 42e9}, p)
    monkeypatch.setenv("TPUSPARSE_CALIBRATION", p)
    # the loader is lazy + once-only (no backend init at import);
    # force re-reads the file the way a fresh process would
    ops._load_calibration_into_cost(force=True)
    assert ops.get_cost_constants()["tiled_bw"] == 42e9


def test_load_rejects_other_backend_fit(tmp_path):
    p = tmp_path / "cal.json"
    p.write_text(
        json.dumps({"constants": {"tiled_bw": 42e9}, "backend": "tpu",
                    "device_kind": "TPU v5e"})
    )
    # tests run on the CPU backend: a TPU-fitted file must not apply
    assert load_calibration(str(p)) is None


def test_routing_honors_constants(rng, restore_constants):
    # a mid-density block pattern near the tiled/gather crossover: with
    # gather made free it must route gather; with gather made absurdly
    # slow it must not
    a = ts.random_csr(3, (1024, 1024), 0.02)
    b = jnp.asarray(rng.random((1024, 256), dtype=np.float32))
    ops.set_cost_constants(
        gather_row_bw=1e18, gather_per_nnz_floor=1e-15
    )
    assert ops._route_spmm(a, b, None) == "gather"
    ops.set_cost_constants(
        gather_row_bw=1e3, gather_per_nnz_floor=1e3
    )
    assert ops._route_spmm(a, b, None) != "gather"


def test_calibrate_raises_on_cpu():
    with pytest.raises(RuntimeError, match="TPU"):
        ts.calibrate(save=False)
