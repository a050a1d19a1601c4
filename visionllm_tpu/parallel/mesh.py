"""Device mesh construction and sharding rules.

The reference's distributed story is data-parallel only (DeepSpeed
ZeRO-1/2/3 over NCCL — SURVEY.md §2.9, visionllmv2/dist_utils.py:33-104).
The TPU-native equivalent is SPMD over a `jax.sharding.Mesh`:

  * axis "data"  — batch sharding (DP). ZeRO-style optimizer-state /
    parameter sharding is expressed by *also* sharding large parameter
    arrays over "data" (fully-sharded data parallel), which XLA turns
    into all-gather-on-use / reduce-scatter-on-grad over ICI.
  * axis "model" — tensor parallelism for the LLM (attention heads and
    MLP hidden dim), unused (size 1) at reference parity but kept so
    the 7B fits smaller chips.

Collectives are emitted by XLA from sharding annotations only — no
hand-written communication (the reference likewise never issues explicit
send/recv; NCCL allreduce ≙ XLA reduce-scatter/all-reduce over ICI).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    n_context: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Mesh with ("data", "context", "model") axes over the devices.

    "context" (sequence parallelism) is held at 1 for reference parity —
    the reference has no long-context path (SURVEY.md §5) — but the axis
    is reserved so ring/blockwise attention can shard over it later
    without re-plumbing shardings."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_context)
    assert n_data * n_model * n_context == len(devices), (
        n_data, n_context, n_model, len(devices))
    arr = np.asarray(devices).reshape(n_data, n_context, n_model)
    return Mesh(arr, ("data", "context", "model"))


@dataclasses.dataclass(frozen=True)
class MeshRules:
    """Regex → PartitionSpec table for parameter sharding.

    Matching is first-hit over `.`-joined param paths. The default table
    FSDP-shards every large matrix over "data" (ZeRO-3 equivalent) and
    TP-shards LLM attention/MLP projections over "model".
    """

    rules: Tuple[Tuple[str, P], ...]

    @classmethod
    def fsdp_tp(cls) -> "MeshRules":
        return cls(rules=(
            # LLM tensor-parallel: column-parallel qkv/gate/up, row-parallel
            # o/down. First dim of a stacked (scanned) kernel is the layer
            # axis, so specs have a leading None.
            (r"llm/.*(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel",
             P(None, "data", "model")),
            (r"llm/.*(o_proj|down_proj)/kernel", P(None, "model", "data")),
            (r"llm/.*embed_tokens/embedding", P("model", "data")),
            (r"llm/.*lm_head/kernel", P("data", "model")),
            # vision tower: FSDP only (stacked layers → leading None)
            (r"vis_encoder/.*(kernel|embedding)$", P(None, "data")),
            # everything else ≥2D: shard the largest (last) dim over data
            (r".*/(kernel|embedding)$", P(None, "data")),
        ))

    def spec_for(self, path: str, shape: Tuple[int, ...],
                 mesh: Mesh) -> P:
        for pat, spec in self.rules:
            if re.search(pat, path):
                spec = _fit_spec(spec, shape, mesh)
                if spec is not None:
                    return spec
        return P()


def _fit_spec(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> Optional[P]:
    """Adapt `spec` to `shape`: trim leading axes if the spec is longer
    than the rank, drop axes that don't divide the dim."""
    parts = list(spec)
    if len(parts) > len(shape):
        parts = parts[len(parts) - len(shape):]
    parts = parts + [None] * (len(shape) - len(parts))
    out = []
    for dim, ax in zip(shape, parts):
        if ax is None:
            out.append(None)
            continue
        size = mesh.shape[ax]
        out.append(ax if dim % size == 0 and dim >= size else None)
    return P(*out)


def shard_params(params: Any, mesh: Mesh,
                 rules: Optional[MeshRules] = None) -> Any:
    """Pytree of NamedShardings matching `params`' structure."""
    rules = rules or MeshRules.fsdp_tp()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)
        specs[name] = rules.spec_for(name, np.shape(leaf), mesh)

    def lookup(path, leaf):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)
        return NamedSharding(mesh, specs[name])

    return jax.tree_util.tree_map_with_path(lookup, params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """NamedShardings that split every array's leading dim over "data"."""
    def spec(leaf):
        if np.ndim(leaf) == 0:
            return NamedSharding(mesh, P())
        n = np.shape(leaf)[0]
        d = mesh.shape["data"]
        ax = "data" if n % d == 0 and n >= d else None
        return NamedSharding(mesh, P(ax))
    return jax.tree_util.tree_map(spec, batch)
