"""Shared CLI plumbing: logging, experiment dirs, checkpoint resolution."""

from __future__ import annotations

import glob
import logging
import os
import shutil
import sys
import time

import jax
import numpy as np

from ..core.checkpoint import load_torch_checkpoint
from ..core.config import Config
from ..models import init_network_variables, init_raft_variables


def setup_logging(save_dir: str) -> logging.Logger:
    """stdout + <save>/log.txt, reference format (train.py:38-43)."""
    os.makedirs(save_dir, exist_ok=True)
    fmt = "%(asctime)s %(message)s"
    logging.basicConfig(
        stream=sys.stdout, level=logging.INFO, format=fmt,
        datefmt="%m/%d %I:%M:%S %p", force=True,
    )
    fh = logging.FileHandler(os.path.join(save_dir, "log.txt"))
    fh.setFormatter(logging.Formatter(fmt))
    logging.getLogger().addHandler(fh)
    return logging.getLogger()


def create_exp_dir(base: str, snapshot_scripts: bool = True) -> str:
    """Timestamped Train-* dir with a script snapshot (train.py:33-34,
    utils/utils.py:109-118)."""
    path = os.path.join(base, "Train-{}".format(time.strftime("%Y%m%d-%H%M%S")))
    os.makedirs(path, exist_ok=True)
    if snapshot_scripts:
        sdir = os.path.join(path, "scripts")
        os.makedirs(sdir, exist_ok=True)
        for script in glob.glob(
            os.path.join(os.path.dirname(__file__), "*.py")
        ):
            shutil.copyfile(
                script, os.path.join(sdir, os.path.basename(script))
            )
    return path


def count_parameters_in_mb(tree) -> float:
    """Parity: utils/utils.py:81-82 (1e6 scale)."""
    return (
        sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)) / 1e6
    )


def load_variables(
    config: Config, *, strict_raft: bool = False, for_training: bool = False
):
    """Resolve (net_vars, raft_vars) from config.

    Order: random init -> (training only) the reference's custom enhancer
    re-init N(0, 0.02)/zeros/N(1, 0.02) (train.py:82-84) -> combined
    checkpoint (model_pretrain) overrides -> explicit RAFT checkpoint
    (raft_weights) overrides raft. Unlike the reference Finetunemodel
    (which silently drops raft.* keys and runs random-init RAFT, SURVEY.md
    section 2.2), missing RAFT weights are loudly logged; strict_raft makes
    them an error.
    """
    from ..models import reinit_enhancer

    log = logging.getLogger()
    net_vars = init_network_variables(jax.random.PRNGKey(config.seed))
    if for_training:
        net_vars = {
            **net_vars,
            "params": reinit_enhancer(
                jax.random.PRNGKey(config.seed + 2), net_vars["params"]
            ),
        }
    raft_vars = init_raft_variables(jax.random.PRNGKey(config.seed + 1))
    raft_loaded = False

    if config.model_pretrain and os.path.exists(config.model_pretrain):
        net_ckpt, raft_ckpt = load_torch_checkpoint(config.model_pretrain)
        if net_ckpt is not None:
            net_vars = _merge(net_vars, net_ckpt)
            log.info("Loaded pre-trained model from %s.", config.model_pretrain)
        if raft_ckpt is not None:
            raft_vars = _merge(raft_vars, raft_ckpt)
            raft_loaded = True
    elif config.model_pretrain:
        log.info("Model is initialized without pre-trained model.")

    if config.raft_weights and os.path.exists(config.raft_weights):
        _, raft_ckpt = load_torch_checkpoint(config.raft_weights)
        if raft_ckpt is not None:
            raft_vars = _merge(raft_vars, raft_ckpt)
            raft_loaded = True

    if not raft_loaded:
        msg = (
            "RAFT weights not loaded -- flow runs with random init "
            "(the reference Finetunemodel has the same failure mode, "
            "model/model.py:272-286). Pass --raft_weights to fix."
        )
        if strict_raft:
            raise FileNotFoundError(msg)
        log.warning(msg)
    return net_vars, raft_vars


def _merge(base: dict, override: dict) -> dict:
    """Key-intersection merge (reference partial-load semantics)."""

    def go(b, o):
        if isinstance(b, dict):
            return {
                k: (go(b[k], o[k]) if isinstance(o, dict) and k in o else b[k])
                for k in b
            }
        return np.asarray(o) if o is not None else b

    return go(base, override)


def save_images_uint8(img01) -> np.ndarray:
    """float [0,1] (H, W, 3) -> uint8, reference clipping (train.py:58-62).

    uint8 input passes through untouched (predict_chunk emit="u8" applies
    the identical formula in-graph)."""
    a = np.asarray(img01)
    if a.dtype == np.uint8:
        return a
    return np.clip(a * 255.0, 0, 255.0).astype("uint8")


def write_png(path: str, img01) -> None:
    import cv2

    cv2.imwrite(path, cv2.cvtColor(save_images_uint8(img01), cv2.COLOR_RGB2BGR))
