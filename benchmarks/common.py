"""Shared benchmark plumbing: logging and timing conventions.

The reference's benchmarks log DEBUG-level results to a per-benchmark
file plus ERROR to console, mirrored with prints (reference
benchmarks/mnist_benchmark.py:23-30, random_tensor_benchmark.py:19-26).
Same protocol here, with the timing method swapped for the async-safe
chained-iteration device timer (see tpusparse/utils/timing.py — host
perf_counter around one call measures the dispatch tunnel, not the
kernel, on this TPU runtime).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

# scripts run from benchmarks/ without an installed package
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def artifact_path(filename: str) -> str:
    """Anchor benchmark artifacts (logs, result JSON) in benchmarks/
    regardless of the CWD the script was launched from."""
    if os.path.isabs(filename):
        return filename
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), filename)


def get_logger(name: str, log_file: str) -> logging.Logger:
    log_file = artifact_path(log_file)
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()
    fh = logging.FileHandler(log_file, mode="a")
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    logger.addHandler(fh)
    ch = logging.StreamHandler(sys.stderr)
    ch.setLevel(logging.ERROR)
    logger.addHandler(ch)
    return logger


def log_and_print(logger: logging.Logger, msg: str) -> None:
    logger.debug(msg)
    print(msg)


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument(
        "--full",
        action="store_true",
        help="run the reference-scale grid (TPU-sized; default is a quick "
        "CPU-runnable subset)",
    )
    p.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (Pallas kernels run in interpreter mode)",
    )
    p.add_argument("--seed", type=int, default=0)
    return p


def setup_platform(cpu: bool = False, n_devices: int | None = None):
    """Select backend. The ambient TPU PJRT plugin overrides JAX_PLATFORMS
    at import, so CPU must be forced through jax.config after import;
    XLA_FLAGS device-count forcing must precede backend initialization."""
    if n_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    if cpu or n_devices:
        jax.config.update("jax_platforms", "cpu")
    return jax
