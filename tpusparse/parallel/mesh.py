"""Device mesh + multi-host process-group utilities.

The reference has no distributed layer at all (single GPU,
cudaSetDevice(0), SURVEY.md §2.5); this module is the TPU-native
communication backend required by BASELINE.json configs[4]: a
`jax.sharding.Mesh` over ICI/DCN axes with XLA collectives inside
shard_map replacing, at once, the (absent) NCCL layer and the reference's
global handle machinery (custom_mm.cpp:100-101) — XLA owns channel setup.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

try:  # JAX ≥0.4.35 canonical location
    _shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map as _shard_map  # type: ignore


def shard_map(f, *, mesh, in_specs, out_specs):
    """jax.shard_map with the varying-mesh-axes checker disabled: Pallas
    pallas_call out_shapes don't carry vma annotations yet, and our bodies
    manage replication explicitly (psum/all_gather where needed)."""
    try:
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    except TypeError:  # older JAX: parameter was named check_rep
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )


def initialize_distributed(**kwargs) -> None:
    """Multi-host process-group bring-up (no-op when single-process).

    On a real pod slice: jax.distributed.initialize() with coordinator
    discovery from the TPU environment; safe to call unconditionally.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices.

    Default: all devices on the trailing ('model') axis with data=1, so a
    single-chip run degenerates gracefully. On a multi-host slice, axes
    should be laid out so 'model' collectives ride ICI (intra-slice) and
    'data' rides DCN — jax.make_mesh's default device order does this.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1,) * (len(axis_names) - 1) + (n,)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    try:
        # JAX ≥0.7 defaults new meshes to Explicit (sharding-in-types) axes;
        # our SPMD layer is shard_map-based and wants Auto semantics.
        axis_types = (jax.sharding.AxisType.Auto,) * len(axis_names)
        return jax.make_mesh(
            shape, tuple(axis_names), devices=devices, axis_types=axis_types
        )
    except (AttributeError, TypeError):  # pragma: no cover - older JAX
        return jax.make_mesh(shape, tuple(axis_names), devices=devices)
