from hcspmm_tpu.models.layers import GCNConv, GINConv, init_conv_params  # noqa: F401
from hcspmm_tpu.models.net import Net, init_net_params, net_forward  # noqa: F401
from hcspmm_tpu.models.sag import SAG  # noqa: F401
