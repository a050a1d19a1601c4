"""Sequence parallelism (the "context" mesh axis).

Megatron-style SP for the LLM prefill: activations are sharded over the
sequence dimension between blocks, so per-chip activation memory and
the elementwise/RMSNorm/MLP work scale as L/S. Inside attention XLA
all-gathers K/V over the context axis (scores stay sharded on the query
dim), which is the standard SP attention lowering; the fully-distributed
alternative — K/V rotating around the ICI ring with an online softmax —
is `ops/ring_attention.py` and plugs into the same axis.

The reference never shards sequences (DeepSpeed ZeRO shards optimizer
state only — visionllmv2/dist_utils.py, SURVEY.md §2.9); this axis is a
TPU-native capability extension, activated simply by building a mesh
with n_context > 1 (`parallel/mesh.py:build_mesh`) and entering it with
`jax.sharding.set_mesh`. With n_context == 1 (reference parity) every
constraint here is a no-op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_SEQ_AXIS = "context"
_BATCH_AXIS = "data"


def ambient_mesh():
    """The mesh made current via `jax.sharding.set_mesh` (or None).

    Safe to call at trace time: the lookup is Python-level, so modules
    can decide whether to emit constraints without threading a mesh
    object through every config."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:                               # noqa: BLE001
        return None
    if mesh is None or not mesh.axis_names:
        return None
    return mesh


def constrain_seq(x: jnp.ndarray, seq_dim: int = 1) -> jnp.ndarray:
    """Pin `x`'s sequence dim to the "context" axis (batch dim 0 to
    "data" when divisible). No-op without an ambient mesh, without a
    context axis, or when the dim doesn't divide — so the same model
    code runs unchanged single-chip, pure-DP, and SP."""
    mesh = ambient_mesh()
    if mesh is None or _SEQ_AXIS not in mesh.axis_names:
        return x
    size = mesh.shape[_SEQ_AXIS]
    if size == 1 or x.shape[seq_dim] % size or x.shape[seq_dim] < size:
        return x
    spec = [None] * x.ndim
    spec[seq_dim] = _SEQ_AXIS
    if (_BATCH_AXIS in mesh.axis_names and seq_dim != 0
            and x.shape[0] % mesh.shape[_BATCH_AXIS] == 0):
        spec[0] = _BATCH_AXIS
    return jax.lax.with_sharding_constraint(x, P(*spec))
