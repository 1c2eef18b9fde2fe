"""Multi-host runtime helpers.

The reference is single-process (SURVEY §2 "Distributed communication
backend: None").  Multi-host here means: ``jax.distributed.initialize`` once
per process, a mesh spanning all hosts' devices (ICI within a slice, DCN
across hosts — XLA routes collectives), chain-major leaves sharded globally,
and file I/O gated to process 0 (``is_io_host``) so the recorder tree is
written once.
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["initialize", "is_io_host", "process_count", "global_mesh"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Thin wrapper over ``jax.distributed.initialize`` (no-op when already
    initialised or single-process with no coordinator configured)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        # already initialised
        pass


def is_io_host() -> bool:
    """True on the process that owns recorder file output."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def global_mesh(axis: str = "chains"):
    """1-D mesh over every device of every host."""
    from .mesh import make_mesh
    return make_mesh(devices=jax.devices(), axis=axis)
