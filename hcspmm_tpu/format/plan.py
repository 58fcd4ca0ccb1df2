"""TPU execution plan for hybrid SpMM.

The reference dispatches both populations inside one CUDA kernel with a
per-block branch on ``hybrid_type[bid]`` (hybrid_all_kernel.cu:960).  XLA
has no cheap per-grid-step divergence, so the TPU design partitions the
window space at preprocessing time into two statically-shaped populations
(SURVEY.md §7 "hard parts" #1):

- **Dense (MXU) path** — windows the LOI selector marks compute-bound.
  Each window's unique neighbour columns are split into tiles of
  ``tile_k`` columns; a tile is a binary ``[window_h, tile_k]`` block (the
  analog of the reference's 16x8 WMMA ``sparse_A``, .cu:1053-1079, widened
  for the 128x128 MXU) stored as int8, plus the tile's global column ids
  (the analog of ``sparse_AToX_index``).  At run time: gather the tile's X
  rows, one batched matmul per tile, segment-sum tiles belonging to the
  same window.  Because columns are deduplicated per window, the HBM
  gather traffic is `sum_w unique_w * D` — never more than the raw CSR
  gather, which is the whole HC-SpMM bandwidth win.

- **Sparse (VPU) path** — memory-bound windows keep CSR semantics: gather
  one X row per edge and segment-sum into output rows (the equivalent of
  the warp-per-row CUDA-core loop, .cu:964-1036).

- **Merge** — a single row-gather assembles the final ``[N, D]`` output
  from ``concat(dense_out, sparse_out, zero_row)`` via a precomputed
  permutation; empty windows map to the zero row.  This keeps the merge
  O(N*D) with no scatter (hard part #1's "output scatter/merge").

All arrays here are static-shaped per graph, so every downstream jit
compiles once per (graph, dim).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from hcspmm_tpu.config import BLK_H, LOICoefficients, PlanConfig
from hcspmm_tpu.format.windows import WindowAnalysis, analyze_windows


def _pad_to(x: np.ndarray, size: int, fill) -> np.ndarray:
    if len(x) >= size:
        return x
    pad = np.full((size - len(x),) + x.shape[1:], fill, dtype=x.dtype)
    return np.concatenate([x, pad])


@dataclasses.dataclass
class ExecutionPlan:
    """Static device-side description of one hybrid SpMM.

    Column index convention: ``num_nodes`` is a valid *dummy* index — SpMM
    implementations append one zero row to X, so padded gathers read zeros.
    """

    num_nodes: int              # rows of this operand (= global N when square)
    num_cols: int               # column space; num_cols is the dummy index
    window_h: int
    tile_k: int
    group: int

    # ---- dense (MXU) path ----
    num_dense_windows: int
    num_tiles: int               # padded to a multiple of `group`
    tile_cols: np.ndarray        # int32 [T, tile_k], padded with num_nodes
    tile_a: np.ndarray           # int8  [T, window_h, tile_k], binary
    tile_seg: np.ndarray         # int32 [T] -> dense-window position (padding -> Wd)
    dense_rows: np.ndarray       # int32 [Wd * window_h] global row of each dense-out row
                                 #       (rows past N point at row 0; merge drops them)

    # ---- sparse (VPU) path ----
    num_sparse_rows: int         # Rs (>= 1; padded)
    num_sparse_edges: int        # Es (>= 1; padded)
    sparse_edge_col: np.ndarray  # int32 [Es], padded with num_nodes
    sparse_edge_seg: np.ndarray  # int32 [Es] -> sparse-row position (padding -> Rs)
    sparse_rows: np.ndarray      # int32 [Rs] global row ids

    # ---- merge ----
    out_perm: np.ndarray         # int32 [N] -> row in concat(dense, sparse, zero)

    # ---- stats (host-only; for roofline/logging) ----
    num_dense_windows_real: int = 0  # before cap padding
    nnz: int = 0
    dense_nnz: int = 0
    sparse_nnz: int = 0
    dense_gather_rows: int = 0   # T * tile_k including padding
    unique_gather_rows: int = 0  # sum of unique cols over dense windows (no padding)

    def device_arrays(self):
        """The pytree of arrays an SpMM implementation needs on device."""
        return {
            "tile_cols": self.tile_cols,
            "tile_a": self.tile_a,
            "tile_seg": self.tile_seg,
            "sparse_edge_col": self.sparse_edge_col,
            "sparse_edge_seg": self.sparse_edge_seg,
            "out_perm": self.out_perm,
        }

    @property
    def gather_bytes_fp32(self) -> int:
        """Ideal HBM gather traffic for D features at fp32 per feature unit."""
        return 4 * (self.dense_gather_rows + self.num_sparse_edges)


@dataclasses.dataclass(frozen=True)
class PlanCaps:
    """Minimum array extents, so per-shard plans of one graph stack into a
    single uniform-shaped ``shard_map`` program (see parallel.partition)."""

    num_dense_windows: int = 0
    num_tiles: int = 0
    num_sparse_rows: int = 0
    num_sparse_edges: int = 0


def build_plan(
    row_pointers: np.ndarray,
    column_index: np.ndarray,
    num_nodes: int,
    config: PlanConfig = PlanConfig(),
    analysis: Optional[WindowAnalysis] = None,
    num_cols: Optional[int] = None,
    caps: PlanCaps = PlanCaps(),
) -> ExecutionPlan:
    """``num_nodes`` counts rows; ``num_cols`` (default: square) sets the
    column space for a rectangular row-block shard of the adjacency."""
    num_cols = num_nodes if num_cols is None else num_cols
    wa = analysis or analyze_windows(
        row_pointers,
        column_index,
        num_nodes,
        window_h=config.window_h,
        loi_mode=config.loi_mode,
        loi_coeffs=config.loi,
        num_cols=num_cols,
    )
    wh, tk, group = config.window_h, config.tile_k, config.group
    n = num_nodes
    c = num_cols
    nnz = len(wa.edge_to_row)

    dense_mask_w = (wa.hybrid_type == 1) & (wa.edge_counts > 0)
    sparse_mask_w = (wa.hybrid_type == 0) & (wa.edge_counts > 0)
    dense_window_ids = np.where(dense_mask_w)[0].astype(np.int64)
    sparse_window_ids = np.where(sparse_mask_w)[0].astype(np.int64)
    num_dense = len(dense_window_ids)

    # -------------------- dense path --------------------
    # tiles per dense window and tile offsets
    uniq_d = wa.unique_counts[dense_window_ids].astype(np.int64)
    tiles_per_w = np.maximum((uniq_d + tk - 1) // tk, 1)
    tile_off = np.zeros(num_dense + 1, dtype=np.int64)
    np.cumsum(tiles_per_w, out=tile_off[1:])
    t_real = int(tile_off[-1])
    t_pad = max(((t_real + group - 1) // group) * group, group, caps.num_tiles)
    num_dense_cap = max(num_dense, caps.num_dense_windows)

    tile_cols = np.full((t_pad, tk), c, dtype=np.int32)
    tile_a = np.zeros((t_pad, wh, tk), dtype=np.int8)
    tile_seg = np.full(t_pad, num_dense_cap, dtype=np.int32)

    if num_dense > 0:
        # window position lookup: global window id -> dense position
        wpos = np.full(wa.num_windows, -1, dtype=np.int64)
        wpos[dense_window_ids] = np.arange(num_dense)

        # fill tile_seg for real tiles
        tile_seg[:t_real] = np.repeat(np.arange(num_dense), tiles_per_w).astype(np.int32)

        # fill tile_cols from per-window sorted unique columns
        # flat position of each unique col within its window
        for_dense = np.isin(wa.edge_to_window, dense_window_ids)
        up, uc = wa.unique_ptr, wa.unique_cols
        # vectorized: for each dense window, copy its unique cols into tiles
        u_starts = up[dense_window_ids]
        u_counts = uniq_d
        # local index of each unique entry within its window
        flat_idx = np.concatenate(
            [np.arange(c) + tile_off[i] * tk for i, c in enumerate(u_counts)]
        ) if num_dense else np.zeros(0, dtype=np.int64)
        flat_vals = np.concatenate(
            [uc[s: s + c] for s, c in zip(u_starts, u_counts)]
        ) if num_dense else np.zeros(0, dtype=np.int32)
        tile_cols.reshape(-1)[flat_idx] = flat_vals

        # fill tile_a from edges of dense windows
        e_w = wa.edge_to_window[for_dense].astype(np.int64)
        e_pos = wpos[e_w]                                  # dense window position
        e_col = wa.edge_to_column[for_dense].astype(np.int64)  # window-local unique idx
        e_row = (wa.edge_to_row[for_dense].astype(np.int64)) % wh
        e_tile = tile_off[e_pos] + e_col // tk
        e_k = e_col % tk
        tile_a.reshape(-1)[e_tile * (wh * tk) + e_row * tk + e_k] = 1

    dense_rows = (
        (dense_window_ids[:, None] * wh + np.arange(wh)[None, :]).reshape(-1)
        if num_dense
        else np.zeros(0, dtype=np.int64)
    )
    dense_rows = np.minimum(dense_rows, n - 1).astype(np.int32) if n > 0 else dense_rows.astype(np.int32)
    # capped padding: sentinel n marks rows no window produces
    dense_rows = _pad_to(dense_rows, num_dense_cap * wh, n)

    # -------------------- sparse path --------------------
    # rows of sparse windows, clipped to N (last window may be partial)
    if len(sparse_window_ids) > 0:
        srows = (sparse_window_ids[:, None] * wh + np.arange(wh)[None, :]).reshape(-1)
        srows = srows[srows < n]
    else:
        srows = np.zeros(0, dtype=np.int64)
    rs_real = len(srows)
    rpos = np.full(n + 1, -1, dtype=np.int64)
    if rs_real:
        rpos[srows] = np.arange(rs_real)

    for_sparse = np.isin(wa.edge_to_window, sparse_window_ids)
    s_cols = column_index[for_sparse].astype(np.int32)
    s_segs = rpos[wa.edge_to_row[for_sparse].astype(np.int64)].astype(np.int32)

    rs = max(rs_real, 1, caps.num_sparse_rows)
    es = max(len(s_cols), 1, caps.num_sparse_edges)
    sparse_rows = _pad_to(srows.astype(np.int32), rs, 0)
    sparse_edge_col = _pad_to(s_cols, es, c)
    sparse_edge_seg = _pad_to(s_segs, es, rs)

    # -------------------- merge permutation --------------------
    # concat layout: [dense Wd_cap*wh rows][sparse Rs rows][1 zero row]
    zero_at = num_dense_cap * wh + rs
    out_perm = np.full(n, zero_at, dtype=np.int64)
    if num_dense:
        # positions in concat for dense rows (drop duplicate-clipped tail rows)
        dpos = np.arange(num_dense * wh)
        real = (dense_window_ids[:, None] * wh + np.arange(wh)[None, :]).reshape(-1)
        in_range = real < n
        out_perm[real[in_range]] = dpos[in_range]
    if rs_real:
        out_perm[srows] = num_dense_cap * wh + np.arange(rs_real)

    dense_nnz = int(wa.edge_counts[dense_window_ids].sum()) if num_dense else 0
    return ExecutionPlan(
        num_nodes=n,
        num_cols=c,
        window_h=wh,
        tile_k=tk,
        group=group,
        num_dense_windows=num_dense_cap,
        num_tiles=t_pad,
        tile_cols=tile_cols,
        tile_a=tile_a,
        tile_seg=tile_seg,
        dense_rows=dense_rows,
        num_sparse_rows=rs,
        num_sparse_edges=es,
        sparse_edge_col=sparse_edge_col,
        sparse_edge_seg=sparse_edge_seg,
        sparse_rows=sparse_rows,
        out_perm=out_perm.astype(np.int32),
        num_dense_windows_real=num_dense,
        nnz=nnz,
        dense_nnz=dense_nnz,
        sparse_nnz=nnz - dense_nnz,
        dense_gather_rows=t_pad * tk,
        unique_gather_rows=int(uniq_d.sum()) if num_dense else 0,
    )


def transpose_csr(
    row_pointers: np.ndarray, column_index: np.ndarray, num_nodes: int
) -> Tuple[np.ndarray, np.ndarray]:
    """CSR of A^T, for the safe (non-symmetric) backward mode the reference
    lacks (it always reuses untransposed A, GNN_model.py:49-57)."""
    import scipy.sparse as sp

    a = sp.csr_matrix(
        (np.ones(len(column_index), dtype=np.int8), column_index, row_pointers),
        shape=(num_nodes, num_nodes),
    )
    at = a.T.tocsr()
    at.sum_duplicates()
    return at.indptr.astype(np.int32), at.indices.astype(np.int32)
