from hcspmm_tpu.ops.spmm import HybridSpMM, make_spmm, spmm_reference_dense  # noqa: F401
from hcspmm_tpu.ops.fused import (  # noqa: F401
    aggregate,
    aggregate_then_update,
    update_then_aggregate,
)
