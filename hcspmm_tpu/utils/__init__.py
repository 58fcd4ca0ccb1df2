from hcspmm_tpu.utils.logging import MetricLogger  # noqa: F401
from hcspmm_tpu.utils.profiling import Timer, roofline  # noqa: F401
from hcspmm_tpu.utils.checkpoint import load_pytree, save_pytree  # noqa: F401
