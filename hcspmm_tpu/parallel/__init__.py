from hcspmm_tpu.parallel.partition import ShardedPlan, build_sharded_plan, pad_rows  # noqa: F401
from hcspmm_tpu.parallel.dist_spmm import DistHybridSpMM, make_dist_spmm  # noqa: F401
