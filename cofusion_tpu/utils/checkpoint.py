"""SLAM-state checkpoint/resume.

The reference has none (SURVEY.md §5.4 — only end-of-run exports and a
destroy-and-rebuild Reset button); here the whole engine state is one pytree, so
checkpointing is a host transfer + pickle.  Mid-sequence resume restores maps,
poses, fern database, lifecycle flags, and the pose history.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path: str, state, timestamps: list[int]) -> None:
    host_state = jax.tree.map(lambda a: np.asarray(a), state)
    with open(path, "wb") as f:
        pickle.dump({"state": host_state, "timestamps": list(timestamps), "version": 1}, f)


def load_state(path: str):
    """Returns (state pytree on the default device, timestamps)."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    state = jax.tree.map(jnp.asarray, blob["state"])
    return state, blob["timestamps"]


def save_engine(engine, path: str) -> None:
    save_state(path, engine.state, engine._timestamps)


def load_engine(engine, path: str) -> None:
    """Restore a checkpoint into an engine constructed with the SAME config."""
    state, ts = load_state(path)
    engine.state = state
    engine._timestamps = ts
    # refresh host-side slot bookkeeping from the restored flags
    active = np.asarray(state.models.active)
    for s in range(1, len(active)):
        if active[s]:
            engine._used_slots.add(s)
            engine._ever_active.add(s)
