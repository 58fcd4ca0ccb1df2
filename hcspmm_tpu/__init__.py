"""hcspmm_tpu — a TPU-native hybrid sparse-matrix-matrix-multiplication (SpMM)
framework for GNN aggregation, with the capabilities of HC-SpMM
(ZJU-DAILY/HC-SpMM, arXiv 2412.08902) re-designed for TPU hardware.

Architecture (TPU-first, not a port):

- ``graphs``   : graph loading (txt/npz/synthetic), CSR building, datasets.
- ``format``   : host-side window analysis (the equivalent of the reference's
                 GPU ``preprocess``, hybrid_all_kernel.cu:213-408), the LOI
                 row-window selector, and the TPU execution plan
                 (MXU block-dense tiles + VPU gather/segment-sum residual).
- ``ops``      : differentiable hybrid SpMM (``jax.custom_vjp``) and the
                 fused layer strategies mirroring the reference's eight
                 autograd functions (GNN_model.py:26-233).
- ``kernels``  : Pallas TPU kernels for the hot paths.
- ``models``   : GCN / GIN layers and networks (HC-SpMM_main.py:66-110).
- ``train``    : training loop + CLI with the reference's flag surface.
- ``parallel`` : multi-chip row-partitioned SpMM with halo exchange over a
                 ``jax.sharding.Mesh`` (net-new; the reference is single-GPU).
- ``loa``      : LOA graph layout reordering (C++ + NumPy, LOI.cpp equivalent).
- ``utils``    : config, logging, profiling/roofline, checkpointing.
"""

__version__ = "0.1.0"

from hcspmm_tpu.utils import arena as _arena

_arena.tune()  # keep the host arena warm (lazy-paged VM; see utils/arena.py)

from hcspmm_tpu.config import BLK_H, BLK_W, HCSpMMConfig  # noqa: F401
