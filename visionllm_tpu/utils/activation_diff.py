"""Per-layer activation-diff tooling for checkpoint/semantic parity.

SURVEY §7 hard part #3: validating parity across the composite model
needs per-layer activation comparison between the reference torch
modules and the JAX rebuild. `TorchTap` records module outputs via
forward hooks; `jax_intermediates` flattens a flax
capture_intermediates tree; `diff_report` pairs them (explicit name
mapping) and reports max-abs diffs sorted worst-first.

Used by tests/test_parity_gdino_reference.py, which instantiates the
ACTUAL reference model (modeling_ov_grounding_dino_mask_dn.py) on CPU
via utils/ref_shims and compares against our GroundingDino after
convert_gdino.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np


class TorchTap:
    """Record named-module outputs of a torch model during forward."""

    def __init__(self, model, names: Iterable[str]):
        self.taps: Dict[str, np.ndarray] = {}
        self._handles = []
        wanted = set(names)
        for name, mod in model.named_modules():
            if name in wanted:
                self._handles.append(mod.register_forward_hook(
                    self._hook(name)))

    def _hook(self, name):
        def fn(_mod, _inp, out):
            import torch
            if isinstance(out, (tuple, list)):
                out = out[0]
            if isinstance(out, torch.Tensor):
                self.taps[name] = out.detach().to(torch.float32).numpy()
        return fn

    def close(self):
        for h in self._handles:
            h.remove()
        self._handles = []

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def jax_intermediates(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a flax capture_intermediates tree ({'__call__': (val,)}
    leaves) into {path: array}."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            p = prefix if k == "__call__" else (
                f"{prefix}/{k}" if prefix else k)
            out.update(jax_intermediates(v, p))
        return out
    if isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            if hasattr(v, "shape"):
                out[prefix if len(tree) == 1 else f"{prefix}.{i}"] = (
                    np.asarray(v, np.float32))
            else:
                out.update(jax_intermediates(v, f"{prefix}.{i}"))
        return out
    if hasattr(tree, "shape"):
        out[prefix] = np.asarray(tree, np.float32)
    return out


def diff_report(
    pairs: Sequence[Tuple[str, np.ndarray, np.ndarray]],
) -> List[Dict[str, Any]]:
    """pairs: (name, reference, candidate) with matching shapes (the
    caller transposes layouts). Returns rows sorted by max_abs desc."""
    rows = []
    for name, ref, cand in pairs:
        ref = np.asarray(ref, np.float32)
        cand = np.asarray(cand, np.float32)
        if ref.shape != cand.shape:
            rows.append({"name": name, "shape_ref": ref.shape,
                         "shape_cand": cand.shape, "max_abs": np.inf})
            continue
        d = np.abs(ref - cand)
        denom = np.maximum(np.abs(ref), 1e-6)
        rows.append({
            "name": name,
            "max_abs": float(d.max()) if d.size else 0.0,
            "mean_abs": float(d.mean()) if d.size else 0.0,
            "max_rel": float((d / denom).max()) if d.size else 0.0,
        })
    return sorted(rows, key=lambda r: -r["max_abs"])


def format_report(rows: Sequence[Dict[str, Any]], top: int = 20) -> str:
    lines = [f"{'layer':50s} {'max_abs':>12s} {'mean_abs':>12s}"]
    for r in rows[:top]:
        if "shape_ref" in r:
            lines.append(f"{r['name']:50s} SHAPE MISMATCH "
                         f"{r['shape_ref']} vs {r['shape_cand']}")
        else:
            lines.append(f"{r['name']:50s} {r['max_abs']:12.3e} "
                         f"{r['mean_abs']:12.3e}")
    return "\n".join(lines)
