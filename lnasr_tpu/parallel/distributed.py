"""Multi-host bring-up.

On a multi-host TPU slice every host runs the same program;
:func:`initialize` wires them into one JAX runtime so ``jax.devices()``
spans the slice and the mesh collectives of this package ride ICI/DCN.
The reference has no distributed layer at all (SURVEY.md §2.4); this is
the minimal production wrapper: explicit initialize, per-process batch
slicing, and a guard against double-init.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (idempotent). With no arguments
    JAX auto-detects the TPU pod environment; arguments are for manual
    CPU/GPU cluster bring-up."""
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
        _initialized = True


def process_local_slice(global_batch: int) -> Tuple[int, int]:
    """Host data loading: the [start, stop) slice of a global batch this
    process should read, so each host feeds only its own devices."""
    per = global_batch // jax.process_count()
    if global_batch % jax.process_count():
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{jax.process_count()} processes"
        )
    start = per * jax.process_index()
    return start, start + per
