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
    """Parameters + iteration + loglik history, as a flat array tree.

    ``done`` marks a run that finished (converged or exhausted its
    iteration budget): resuming a done checkpoint is a no-op, so an
    interrupted-and-resumed run ends bitwise identical to an
    uninterrupted one even when the EM loop stopped early."""

    def __init__(self, params, iteration: int = 0,
                 history: Optional[List[float]] = None, done: bool = False):
        self.params = params
        self.iteration = iteration
        self.history = list(history or [])
        self.done = bool(done)


def save_train_state(path: str, state: TrainState) -> None:
    """Atomic ``.npz`` checkpoint of a :class:`TrainState`. ``params`` may
    be any pytree of arrays (e.g. ``HMMParams`` / ``GMMHMMParams``)."""
    leaves, treedef = jax.tree.flatten(state.params)
    meta = {
        "iteration": state.iteration,
        "history": state.history,
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "done": state.done,
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
    return TrainState(params, meta["iteration"], meta["history"],
                      meta.get("done", False))


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

    def restore_state(self, like_params) -> TrainState:
        if os.path.exists(self.path):
            return load_train_state(self.path, like_params)
        return TrainState(like_params)

    def maybe_save(self, iteration: int, params, history: List[float],
                   done: bool = False) -> bool:
        if done or iteration % self.every == 0:
            save_train_state(
                self.path, TrainState(params, iteration, history, done)
            )
            return True
        return False


def checkpointer_from_config(config) -> Optional["Checkpointer"]:
    """A :class:`Checkpointer` when a :class:`~lnasr_tpu.config.TrainConfig`
    enables one (``checkpoint_every > 0`` and ``checkpoint_dir`` set),
    else ``None``."""
    if config is None or not config.checkpoint_dir:
        return None
    if config.checkpoint_every <= 0:
        return None
    return Checkpointer(config.checkpoint_dir, every=config.checkpoint_every)


def em_loop(
    step_fn,
    params,
    iters: int,
    eps: float,
    verbose: bool = False,
    checkpointer: Optional["Checkpointer"] = None,
    fmt: str = "Iter: {it:3}, L(lambda|O) = {loglik:.6e}",
):
    """The shared EM driver behind every trainer (``HMM.train``,
    ``train_data_parallel``, ``train_seq_parallel``): runs ``step_fn``
    (params -> (params, loglik)) until |Δ loglik| < eps or ``iters``
    sweeps, with the reference's convergence rule (``lnasr/hmm.py:
    285-313``) and — when a checkpointer is given — periodic atomic
    saves plus deterministic resume. An interrupted run resumed from its
    checkpoint ends with bitwise-identical parameters to an
    uninterrupted one: the step is deterministic, the ``.npz``
    round-trip preserves bits, and a finished run is marked ``done`` so
    re-running it is a no-op.

    Returns ``(params, history)``.
    """
    start, history = 0, []
    if checkpointer is not None:
        state = checkpointer.restore_state(params)
        if state.done:
            return state.params, state.history
        start, params, history = state.iteration, state.params, state.history
    prev = history[-1] if history else None
    it = start
    for it in range(start, iters):
        params, loglik = step_fn(params)
        loglik = float(loglik)
        history.append(loglik)
        if verbose:
            print(fmt.format(it=it, loglik=loglik))
        converged = prev is not None and abs(loglik - prev) < eps
        if checkpointer is not None:
            # ``done`` marks convergence only: a budget-exhausted run can
            # be resumed with a larger ``iters`` and simply continues
            checkpointer.maybe_save(it + 1, params, history, done=converged)
        if converged:
            break
        prev = loglik
    return params, history
