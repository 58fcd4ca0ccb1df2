"""Checkpoint / resume (net-new; the reference never saves the model,
HC-SpMM_main.py:157-166 / SURVEY.md §5).

Hand-rolled .npz + JSON treedef: models here are a handful of small
matrices, so a dependency-light format beats orbax machinery.  Arrays are
stored flattened in pytree order; the treedef is reconstructed from a
JSON skeleton with array placeholders.
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np

_PLACEHOLDER = "__array__"


def _skeleton(tree) -> Any:
    return jax.tree.map(lambda _: _PLACEHOLDER, tree)


def save_pytree(path: str, tree, metadata: dict | None = None) -> None:
    """Atomic save: a crash mid-write (the failure mode the elastic
    supervisor recovers from, train.elastic) must never corrupt the last
    good checkpoint, so the file is written to a temp name and
    os.replace()d into place."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    final = path if path.endswith(".npz") else path + ".npz"
    tmp = final + f".tmp.{os.getpid()}.npz"
    np.savez(
        tmp,
        __treedef__=json.dumps(jax.tree.map(lambda _: _PLACEHOLDER, tree)),
        __meta__=json.dumps(metadata or {}),
        **arrays,
    )
    os.replace(tmp, final)


def load_pytree(path: str) -> Tuple[Any, dict]:
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        # np.savez appends .npz; accept the suffix-less name the CLI's
        # --checkpoint flag recorded
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    skeleton = json.loads(str(data["__treedef__"]))
    meta = json.loads(str(data["__meta__"]))
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    _, treedef = jax.tree.flatten(skeleton)
    return jax.tree.unflatten(treedef, leaves), meta
