"""Checkpoint / resume.

The reference checkpoints parameters only, via HDF5 (``lnasr/hmm.py:
252-266``, ``gmmhmm.py:190-208``) and the ARPA text format for LMs —
both of which this framework reads and writes natively (see
``models/hmm.py``, ``models/gmmhmm.py``, ``models/ngram.py``).

This module adds what production training needs on top (SURVEY.md §5):
*training-state* checkpoints — parameters plus the EM iteration counter
and loglik history — with atomic writes, periodic save, and deterministic
resume. Storage is a flat NumPy ``.npz`` of the parameter pytree: EM
parameter sets are megabytes, replicated across hosts, and gathered to
host anyway for the HDF5/ARPA interchange formats, so a sharded-array
checkpoint layer (orbax) buys nothing at this scale; revisit if graph
models ever outgrow a host.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def _atomic_write(path: str, write_fn) -> None:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        write_fn(tmp)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


class TrainState:
    """Parameters + iteration + loglik history, as a flat array tree."""

    def __init__(self, params, iteration: int = 0, history: Optional[List[float]] = None):
        self.params = params
        self.iteration = iteration
        self.history = list(history or [])


def save_train_state(path: str, state: TrainState) -> None:
    """Atomic ``.npz`` checkpoint of a :class:`TrainState`. ``params`` may
    be any pytree of arrays (e.g. ``HMMParams`` / ``GMMHMMParams``)."""
    leaves, treedef = jax.tree.flatten(state.params)
    meta = {
        "iteration": state.iteration,
        "history": state.history,
        "treedef": str(treedef),
        "n_leaves": len(leaves),
    }

    def write(tmp):
        np.savez(
            tmp,
            __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
            **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
        )
        # np.savez appends .npz when missing; normalize
        if not tmp.endswith(".npz") and os.path.exists(tmp + ".npz"):
            os.replace(tmp + ".npz", tmp)

    _atomic_write(path, write)


def load_train_state(path: str, like_params) -> TrainState:
    """Load a checkpoint into the structure of ``like_params`` (used as the
    pytree template; shapes must match)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        leaves = [data[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    template_leaves, treedef = jax.tree.flatten(like_params)
    if len(template_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has "
            f"{len(template_leaves)}"
        )
    params = jax.tree.unflatten(treedef, leaves)
    return TrainState(params, meta["iteration"], meta["history"])


class Checkpointer:
    """Periodic training checkpoints with resume.

    Usage in an EM loop::

        ckpt = Checkpointer(dir, every=5)
        start, params, history = ckpt.restore(params)
        for it in range(start, iters):
            params, loglik = step(params, ...)
            history.append(loglik)
            ckpt.maybe_save(it + 1, params, history)
    """

    FILENAME = "train_state.npz"

    def __init__(self, directory: str, every: int = 1):
        self.directory = directory
        self.every = max(1, every)

    @property
    def path(self) -> str:
        return os.path.join(self.directory, self.FILENAME)

    def restore(self, like_params) -> Tuple[int, Any, List[float]]:
        if os.path.exists(self.path):
            state = load_train_state(self.path, like_params)
            return state.iteration, state.params, state.history
        return 0, like_params, []

    def maybe_save(self, iteration: int, params, history: List[float]) -> bool:
        if iteration % self.every == 0:
            save_train_state(self.path, TrainState(params, iteration, history))
            return True
        return False
