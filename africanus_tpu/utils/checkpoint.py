"""Checkpoint/resume for long-running solves (SURVEY.md §5: the reference
has no checkpointing — persistence is writing MODEL_DATA back to the MS;
the TPU build adds orbax-backed pytree checkpoints for iterative work
like selfcal loops and CLEAN majors that outlive a single run).

``save``/``restore`` handle arbitrary pytrees of arrays (including
``Cplx`` pairs — any registered pytree). ``CheckpointLoop`` wraps an
iterative driver: it restores the latest step on construction and saves
every ``every`` steps, so a killed job resumes where it stopped.
"""

from __future__ import annotations

import os

import numpy as np
import jax

__all__ = ["save", "restore", "latest_step", "CheckpointLoop"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save(path, tree, force=True):
    """Write a pytree checkpoint to ``path`` (a directory); blocks until
    the checkpoint is durable (orbax saves asynchronously by default)."""
    path = os.path.abspath(str(path))
    ckpt = _checkpointer()
    ckpt.save(path, jax.tree_util.tree_map(np.asarray, tree), force=force)
    ckpt.wait_until_finished()


def restore(path, like=None):
    """Read a pytree checkpoint. ``like`` (a matching pytree of arrays or
    ShapeDtypeStructs) restores into that structure; without it the raw
    saved tree (dicts/lists of arrays) is returned."""
    path = os.path.abspath(str(path))
    if like is None:
        return _checkpointer().restore(path)
    like = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not isinstance(x, jax.ShapeDtypeStruct) else x,
        like,
    )
    return _checkpointer().restore(path, target=like)


def latest_step(directory):
    """Largest ``step_N`` checkpoint index under ``directory`` or None."""
    try:
        entries = os.listdir(str(directory))
    except FileNotFoundError:
        return None
    steps = [
        int(e.split("_", 1)[1])
        for e in entries
        if e.startswith("step_") and e.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None


class CheckpointLoop:
    """Resumable iteration driver.

    >>> loop = CheckpointLoop("/tmp/selfcal_ckpt", init_state, every=10)
    >>> for step, state in loop.range(200):
    ...     state = update(state)
    ...     loop.state = state
    resumes from the latest saved step after a restart.
    """

    def __init__(self, directory, init_state, every=10):
        self.directory = str(directory)
        self.every = int(every)
        step = latest_step(self.directory)
        if step is None:
            self.start = 0
            self.state = init_state
        else:
            self.start = step + 1
            self.state = restore(
                os.path.join(self.directory, f"step_{step}"), like=init_state
            )

    def _save(self, step):
        save(os.path.join(self.directory, f"step_{step}"), self.state)

    def range(self, n_steps):
        for step in range(self.start, n_steps):
            yield step, self.state
            if (step + 1) % self.every == 0 or step == n_steps - 1:
                self._save(step)
