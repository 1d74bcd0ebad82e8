"""Sharded, asynchronous training checkpoints (Orbax).

The npz format in :mod:`dirjax.utils.checkpoints` is the *interop* path
(it round-trips with the reference's torch ``.pt`` files,
/root/reference/dirtorch/utils/common.py:117-147) — but it gathers every
array to host and blocks the training loop while writing. This module is
the *scale* path, built on ``orbax.checkpoint``, the standard JAX/TPU
checkpointing library:

- **sharded writes**: each process writes only the array shards it owns
  (tensorstore/OCDBT under the hood) — no host gather, multi-host safe;
- **async saves**: the write happens behind the next training epoch
  (``enable_async_checkpointing``), so checkpoint cost overlaps compute;
- **shard-placing restore**: arrays are restored straight onto the
  shardings carried by the abstract template — a TP-sharded FC layer
  never materializes unsharded anywhere;
- **retention**: the newest ``max_to_keep`` steps are kept, older ones
  reaped by the manager.

Scalars/config (epoch, best monitor, arch) ride along as a JSON item so
the tensor tree stays restorable from shapes alone.

Use :class:`TrainCheckpointer` directly, or via
``fit(..., ckpt_format="orbax")`` / ``python -m dirjax.train
--ckpt-format orbax`` (resume by passing the checkpoint *directory*).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax

__all__ = ["TrainCheckpointer", "is_orbax_dir"]


def _abstract(tree):
    """Shape/dtype/sharding skeleton of a pytree of (possibly sharded)
    arrays — what orbax needs to restore without a live copy. Leaves
    that already are ``ShapeDtypeStruct`` pass through; jax Arrays keep
    their sharding so restore places shards directly on the mesh."""

    def leaf(a):
        if isinstance(a, jax.ShapeDtypeStruct):
            return a
        sharding = a.sharding if isinstance(a, jax.Array) else None
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sharding)

    return jax.tree.map(leaf, tree)


def is_orbax_dir(path: str) -> bool:
    """True if ``path`` looks like a :class:`TrainCheckpointer` directory
    (used by ``fit(resume=...)`` to dispatch npz-file vs orbax-dir)."""
    if not os.path.isdir(path):
        return False
    return any(d.isdigit() for d in os.listdir(path))


class TrainCheckpointer:
    """Orbax CheckpointManager wrapper for (params, opt_state, extra).

    Parameters
    ----------
    directory:
        checkpoint root; one numbered subdirectory per saved step.
    max_to_keep:
        retention window (oldest steps are deleted as new ones land).
    async_save:
        overlap the write with subsequent compute; :meth:`wait` (or
        :meth:`close`) blocks until every pending save is durable.
    """

    def __init__(self, directory: str, *, max_to_keep: int = 2,
                 async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save),
            item_names=("state", "extra"),
        )

    # --- write -----------------------------------------------------------

    def save(self, step: int, params, opt_state=None,
             extra: Optional[Dict[str, Any]] = None) -> None:
        """Queue a save of ``{"params", "opt_state"}`` + JSON ``extra``.

        With ``async_save`` the call returns as soon as the arrays are
        snapshotted (device->host copy of local shards); the disk write
        proceeds in the background. A later ``save`` waits for the
        previous one first (orbax serializes saves)."""
        ocp = self._ocp
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        self._mngr.save(int(step), args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            extra=ocp.args.JsonSave(dict(extra or {}))))

    def wait(self) -> None:
        """Block until every queued save is fully on disk."""
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()

    # --- read ------------------------------------------------------------

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def all_steps(self):
        return self._mngr.all_steps()

    def read_extra(self, step: Optional[int] = None) -> Dict[str, Any]:
        """Read only the JSON ``extra`` item (cheap — no tensor reads).
        Lets callers validate config (e.g. arch) before committing to a
        full restore."""
        ocp = self._ocp
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoint steps under {self.directory}")
        r = self._mngr.restore(int(step), args=ocp.args.Composite(
            extra=ocp.args.JsonRestore()))
        return dict(r["extra"] or {})

    def restore(self, params_template, opt_state_template=None,
                step: Optional[int] = None
                ) -> Tuple[Any, Any, Dict[str, Any]]:
        """Restore ``(params, opt_state, extra)`` from ``step`` (default:
        latest). Templates may be live pytrees or ``ShapeDtypeStruct``
        trees; leaves carrying a sharding are restored ONTO it (shards
        land on their devices, nothing materializes replicated)."""
        ocp = self._ocp
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoint steps under {self.directory}")
        abstract = {"params": _abstract(params_template)}
        if opt_state_template is not None:
            abstract["opt_state"] = _abstract(opt_state_template)
        r = self._mngr.restore(int(step), args=ocp.args.Composite(
            state=ocp.args.StandardRestore(abstract),
            extra=ocp.args.JsonRestore()))
        state, extra = r["state"], dict(r["extra"] or {})
        return state["params"], state.get("opt_state"), extra

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
