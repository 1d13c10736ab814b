"""Training checkpoint / resume on orbax.

The reference has no checkpointing at all — its MNIST benchmark trains
and discards (reference benchmarks/mnist_benchmark.py: no torch.save
anywhere; SURVEY.md §5.4). On TPU pods, elastic training requires it, so
the framework ships the idiomatic JAX slot-in: an orbax CheckpointManager
wrapper that saves/restores (params, opt_state, step) pytrees — sparse
CSR/BSR weights included, since they are registered pytrees whose leaves
are plain arrays — with retention and atomic-write semantics handled by
orbax. Works under multi-host sharding: orbax saves each shard from its
owner process.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin lifecycle wrapper: save(step, state) / restore([step]) / steps.

    `state` is any pytree (params, opt_state, metadata, ...). Restore
    without a template returns arrays on the default device; pass
    `template` (a matching pytree, e.g. from a fresh init) to restore
    with the template's shardings/dtypes — required when resuming a
    sharded training state on a mesh.
    """

    def __init__(self, directory: str, max_to_keep: int = 3, save_interval: int = 1):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval,
                create=True,
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        return bool(saved)

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint steps found")
        if template is not None:
            restore_args = ocp.args.StandardRestore(template)
        else:
            restore_args = ocp.args.StandardRestore()
        return self._mgr.restore(step, args=restore_args)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def save_checkpoint(directory: str, step: int, state: Any) -> None:
    """One-shot save (opens and closes a manager)."""
    with CheckpointManager(directory) as mgr:
        mgr.save(step, state, force=True)


def restore_checkpoint(
    directory: str, step: Optional[int] = None, template: Any = None
) -> Any:
    """One-shot restore of the given (default: latest) step."""
    with CheckpointManager(directory) as mgr:
        return mgr.restore(step, template=template)
