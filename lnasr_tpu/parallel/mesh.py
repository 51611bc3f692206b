"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from lnasr_tpu.config import MeshConfig


def mesh_shape_for(n_devices: int, data: int = -1, seq: int = 1, model: int = 1) -> MeshConfig:
    """Fill in the -1 axis so data*seq*model == n_devices."""
    fixed = seq * model * (data if data > 0 else 1)
    if data <= 0:
        if n_devices % (seq * model):
            raise ValueError(f"{n_devices} devices not divisible by seq*model={seq * model}")
        data = n_devices // (seq * model)
    elif data * seq * model != n_devices:
        raise ValueError(f"mesh {data}x{seq}x{model} != {n_devices} devices")
    return MeshConfig(data=data, seq=seq, model=model)


def make_mesh(config: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Build a ('data', 'seq', 'model') mesh over the given (or all)
    devices. With a single device this degrades to a (1, 1, 1) mesh, so
    sharded code paths run unchanged on one chip."""
    if devices is None:
        devices = jax.devices()
    if config is None:
        config = mesh_shape_for(len(devices))
    arr = np.asarray(devices).reshape(config.shape)
    return Mesh(arr, config.axis_names)
