from hcspmm_tpu.format.windows import WindowAnalysis, analyze_windows  # noqa: F401
from hcspmm_tpu.format.loi import decide_hybrid_type, loi_score  # noqa: F401
from hcspmm_tpu.format.plan import ExecutionPlan, build_plan  # noqa: F401
