from .corr import build_corr_pyramid, lookup_corr
from .encoder import BasicEncoder, ResidualBlock
from .raft import convex_upsample_flow, init_raft_variables, raft_forward
from .update import BasicMotionEncoder, BasicUpdateBlock, FlowHead, SepConvGRU

__all__ = [
    "BasicEncoder",
    "BasicMotionEncoder",
    "BasicUpdateBlock",
    "FlowHead",
    "ResidualBlock",
    "SepConvGRU",
    "build_corr_pyramid",
    "convex_upsample_flow",
    "init_raft_variables",
    "lookup_corr",
    "raft_forward",
]
