"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_shards: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_name: str = "shard",
    dp: int = 1,
    dp_axis: str = "dp",
) -> Mesh:
    """Build a (dp, shard) mesh over the given (or all) devices.

    `dp` splits the *query batch* (data parallel over queries); `shard`
    splits the corpus rows. A 1-D corpus-sharded mesh is the default
    (dp=1) — rows are the only axis a vector store needs (SURVEY.md §2).
    """
    if devices is None:
        devices = jax.devices()
    if n_shards is None:
        n_shards = len(devices) // dp
    use = np.asarray(devices[: dp * n_shards]).reshape(dp, n_shards)
    return Mesh(use, (dp_axis, axis_name))


def default_mesh(axis_name: str = "shard") -> Mesh:
    """All local devices on one corpus-shard axis."""
    devices = np.asarray(jax.devices())
    return Mesh(devices.reshape(1, -1), ("dp", axis_name))
