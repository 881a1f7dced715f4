from .lpips import LPIPSScorer, convert_torch_lpips, lpips_distance
from .vmaf import score_sequences, vmaf_available
from .metrics import (
    frame_metrics,
    match_histograms,
    psnr_uint8,
    ssim_uint8,
    to_uint8,
)

__all__ = [
    "LPIPSScorer",
    "convert_torch_lpips",
    "frame_metrics",
    "lpips_distance",
    "match_histograms",
    "psnr_uint8",
    "ssim_uint8",
    "to_uint8",
    "score_sequences",
    "vmaf_available",
]
