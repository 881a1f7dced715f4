from .denoise import Denoise1, Denoise2
from .enhancer import Enhancer
from .layers import Conv, TorchBatchNorm, instance_norm, leaky_relu02
from .network import (
    DENOISE_1,
    DENOISE_2,
    ENHANCER,
    TrainOutputs,
    forward_inference,
    forward_train,
    init_network_variables,
    reinit_enhancer,
    update_cache,
)
from .raft import init_raft_variables, raft_forward

__all__ = [
    "Conv",
    "DENOISE_1",
    "DENOISE_2",
    "Denoise1",
    "Denoise2",
    "ENHANCER",
    "Enhancer",
    "TorchBatchNorm",
    "TrainOutputs",
    "forward_inference",
    "forward_train",
    "init_network_variables",
    "init_raft_variables",
    "instance_norm",
    "leaky_relu02",
    "raft_forward",
    "reinit_enhancer",
    "update_cache",
]
