from floodsr_tpu.nn.resunet import (
    ResUNetConfig,
    count_params,
    init_resunet,
    resunet_apply,
)

__all__ = ["ResUNetConfig", "init_resunet", "resunet_apply", "count_params"]
