"""Hand-written Pallas TPU kernels for the hybrid SpMM hot path."""

from hcspmm_tpu.kernels.block_spmm import spmm_pallas  # noqa: F401
