"""One typed configuration shared by every CLI.

The reference duplicates argparse flags across train.py:15-27,
predict.py:23-36 and evals.py:26-39 with hard-coded model hyperparameters
scattered through model/model.py and loss.py. Here a single dataclass is the
source of truth; CLI flag names and defaults match the reference exactly so
commands port 1:1.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass


@dataclass
class Config:
    # --- reference argparse surface (same names, same defaults) ---
    batch_size: int = 1
    seed: int = 2
    epochs: int = 5
    lr: float = 1e-4
    save: str = "./EXP/"
    model_pretrain: str | None = None
    lowlight_images_path: str = ""
    of_scale: int = 3
    dataset: str = "RLV"
    num_workers: int = 0
    gain: int = 100  # evals.py:39 (unused there too; kept for parity)

    # --- model hyperparameters (hard-coded in the reference) ---
    enhancer_layers: int = 3  # model/model.py:89
    enhancer_channels: int = 64
    denoise_channels: int = 48  # model/model.py:90-91
    raft_iters: int = 12  # model/model.py:245
    # fast-operating-point knob: illumination estimator at 1/enh_scale
    # res with bilinear s2 upsample (quality-gated; 1 = exact reference
    # semantics). Inference only; training always runs full-res.
    enh_scale: int = 1
    corr_levels: int = 4  # model/RAFT/raft.py:30
    corr_radius: int = 4

    # --- optimizer (train.py:98, :130) ---
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    weight_decay: float = 3e-4
    grad_clip: float = 5.0

    # --- data (dataloader/multi_read_data.py:129) ---
    frame_width: int = 1920
    frame_height: int = 1080

    # --- TPU-native knobs (no reference equivalent) ---
    raft_weights: str | None = None  # explicit RAFT checkpoint (SURVEY 2.2)
    resume: str | None = None  # full-train-state checkpoint, or "auto"
    precision: str = "highest"  # "highest" (f32-faithful) | "fast" (bf16 MXU)
    compute_dtype: str = "float32"  # or "bfloat16" fast path
    mesh_data: int = 1  # scene-parallel axis size
    mesh_spatial: int = 1  # spatial-sharding axis size
    prefetch_depth: int = 2  # host->device double buffering
    chunk: int = 1  # frames per lax.scan dispatch (train_chunk/predict_chunk)
    spatial_bands: int = 1  # >1: per-band gradient accumulation (train_step_spatial)
    spatial_halo: int = 32  # halo rows per band (grad receptive field ~24)

    @property
    def is_wb(self) -> bool:
        """Adaptive white balance for underwater data (model/model.py:94)."""
        return self.dataset == "underwater"

    @property
    def frame_size(self) -> tuple[int, int]:
        return (self.frame_height, self.frame_width)


def add_config_args(parser: argparse.ArgumentParser) -> None:
    """Register every Config field as a CLI flag (reference-compatible)."""
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        if f.type == "bool":
            parser.add_argument(name, type=lambda s: s.lower() == "true",
                                default=f.default)
        else:
            typ = {"int": int, "float": float}.get(str(f.type), str)
            if "str | None" in str(f.type):
                typ = str
            parser.add_argument(name, type=typ, default=f.default)


def config_from_args(args: argparse.Namespace) -> Config:
    names = {f.name for f in dataclasses.fields(Config)}
    return Config(**{k: v for k, v in vars(args).items() if k in names})
