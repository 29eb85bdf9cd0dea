"""Trace-time mesh context for custom kernels.

Pallas kernels are opaque to GSPMD: under a multi-device ``jit`` an
unannotated ``pallas_call`` forces XLA to gather its operands onto every
device. The fix is ``jax.shard_map`` — but the kernel call sites live
inside flax modules that know nothing about devices. This module carries
the active mesh as trace-time context: the trainer / bench / dryrun set
it (``with active_mesh(mesh): ...``) around tracing, and kernel wrappers
(``ops/fused_attention.fused_attention_sharded``) consult it to shard the
grid over (data, model) with zero communication — the kernels are
per-(batch, head) independent.
"""

from __future__ import annotations

import contextlib
from typing import Optional

from jax.sharding import Mesh

_ACTIVE: list = []


@contextlib.contextmanager
def active_mesh(mesh: Optional[Mesh]):
    """Set the mesh custom kernels shard over (trace-time; nestable)."""
    _ACTIVE.append(mesh)
    try:
        yield mesh
    finally:
        _ACTIVE.pop()


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE[-1] if _ACTIVE else None
