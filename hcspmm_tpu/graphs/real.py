"""Real (non-synthetic) datasets available without network egress.

The reference loads real downloads (dataset.py:46-82); its Dataset.zip is
a missing blob in the snapshot and this rig has zero egress, so the real
data here comes from libraries baked into the image:

- **digits-knn**: scikit-learn's bundled handwritten-digits set (1,797
  samples, REAL 64-dim pixel features, REAL 10-class labels) under the
  standard k-NN-graph construction used by GNN benchmarks — a genuinely
  real dataset end-to-end (features, labels, graph all from real data).
- **karate / lesmis / davis / florentine**: the classic real graphs
  shipped with networkx (Zachary's karate club, Les Miserables
  co-occurrence, Davis southern women, Florentine families).  Features
  follow the reference's convention (random normal, labels all-ones,
  dataset.py:109-121) since these graphs carry no feature matrix.

``write_reference_txt`` emits the reference's text format ("dst,src",
1-indexed, dataset.py:46-61) so the committed copies in data/ exercise
``io.load_edges_any`` on a real file.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

REAL_GRAPHS = ("karate", "lesmis", "davis", "florentine")


def networkx_edges(name: str) -> Tuple[np.ndarray, np.ndarray, int]:
    """Symmetric (src, dst, num_nodes) of a classic real graph."""
    import networkx as nx

    g = {
        "karate": nx.karate_club_graph,
        "lesmis": nx.les_miserables_graph,
        "davis": nx.davis_southern_women_graph,
        "florentine": nx.florentine_families_graph,
    }[name]()
    relabel = {v: i for i, v in enumerate(g.nodes())}
    e = np.array([(relabel[u], relabel[v]) for u, v in g.edges()],
                 dtype=np.int32)
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    return src, dst, g.number_of_nodes()


def digits_knn(k: int = 8) -> Tuple[np.ndarray, np.ndarray, int,
                                    np.ndarray, np.ndarray]:
    """k-NN graph over scikit-learn's real digits data.

    Returns (src, dst, num_nodes, x[N, 64] float32 real pixel features,
    y[N] int64 real class labels).  The graph is symmetrized (an edge
    in either direction keeps both), matching the reference's implicit
    symmetric-A assumption (GNN_model.py:49-57).
    """
    from sklearn.datasets import load_digits
    from sklearn.neighbors import NearestNeighbors

    d = load_digits()
    x = d.data.astype(np.float32) / 16.0  # real 8x8 pixel intensities
    y = d.target.astype(np.int64)
    nbrs = NearestNeighbors(n_neighbors=k + 1).fit(x)
    _, idx = nbrs.kneighbors(x)
    n = x.shape[0]
    src = np.repeat(np.arange(n, dtype=np.int32), k)
    dst = idx[:, 1:].reshape(-1).astype(np.int32)  # drop self
    s = np.concatenate([src, dst])
    t = np.concatenate([dst, src])
    return s, t, n, x, y


def write_reference_txt(path: str, src: np.ndarray, dst: np.ndarray) -> None:
    """Emit the reference's edge-list text format: one "dst,src" pair per
    line, 1-indexed (dataset.py:46-61)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for d, s in zip(dst, src):
            f.write(f"{int(d) + 1},{int(s) + 1}\n")
