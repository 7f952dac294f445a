"""Checkpoint save/restore via orbax (reference: utils/train_util.py ->
save_checkpoint / load_state, ckpt_latest / ckpt_best semantics).

Stores params + batch_stats + opt_state + step.  ``save`` keeps the latest
``keep`` checkpoints and optionally tags one as "best" (the reference keeps
the best-val-MOTA model).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                             create=True),
    )


def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 3,
                    metrics: Optional[Dict[str, float]] = None) -> None:
    mgr = _manager(ckpt_dir, keep)
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "opt_state": state.opt_state, "step": state.step}
    mgr.save(step, args=ocp.args.StandardSave(payload), metrics=metrics)
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(ckpt_dir: str, state, step: Optional[int] = None):
    """Restore into an existing TrainState template (shapes must match)."""
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step}
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"],
                         step=restored["step"])


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    s = mgr.latest_step()
    mgr.close()
    return s
