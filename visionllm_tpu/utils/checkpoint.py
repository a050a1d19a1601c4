"""Checkpoint save/restore via orbax + auto-resume.

Behavioral reference: the reference's HF-Trainer checkpointing
(visionllmv2/train/train.py:235-269 save paths, get_last_checkpoint
:314-327 auto-resume). TPU-native: orbax handles sharded arrays
(ZeRO-style FSDP state saves/restores without gathering), one
checkpoint dir per step, `latest_step` resume.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax


def _mgr(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir),
                                 options=options)


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    max_to_keep: int = 3) -> None:
    import orbax.checkpoint as ocp
    mgr = _mgr(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if re.match(r"^\d+$", d)]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, target: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure (and shardings) of `target`."""
    import orbax.checkpoint as ocp
    step = step if step is not None else latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    mgr = _mgr(ckpt_dir)
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(target))
    return restored


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export (small models / interchange)."""
    import numpy as np
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for p, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in p)
        out[name] = np.asarray(leaf)
    np.savez(path, **out)


def load_params_npz(path: str) -> Any:
    """Inverse of save_params_npz → nested dict pytree."""
    import numpy as np
    flat = np.load(path)
    root: dict = {}
    for name in flat.files:
        parts = name.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = flat[name]
    return root


def merge_param_trees(a: Any, b: Any) -> Any:
    """Recursive param-dict union — e.g. an infer_det-initialized tree ∪
    an infer_pose-initialized tree of the same composite model (shared
    modules taken from `a`, tool branches from whichever has them)."""
    out = dict(a)
    for k, v in b.items():
        out[k] = merge_param_trees(out[k], v) if (
            k in out and isinstance(v, dict)) else out.get(k, v)
    return out
