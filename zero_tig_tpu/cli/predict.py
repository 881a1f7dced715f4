"""Streaming inference CLI. Parity: reference predict.py (same flags/layout).

Saves per frame: <save>/<scene>/<brightness>/<name>_{denoise,enhance}.png
for RLV, <save>/<scene-dir>/... otherwise (predict.py:91-104).
"""

from __future__ import annotations

import argparse
import logging
import os

import jax.numpy as jnp
import numpy as np

from ..core.config import Config, add_config_args, config_from_args
from ..data import create_dataset, device_prefetch
from ..pipeline import predict_step
from .common import load_variables, setup_logging, write_png


def run_predict(config: Config) -> None:
    setup_logging(config.save)
    log = logging.getLogger()
    log.info("Model path = %s", str(config.model_pretrain))

    net_vars, raft_vars = load_variables(config)
    size = (config.frame_width, config.frame_height)
    test_ds = create_dataset(
        config.dataset, config.lowlight_images_path, "test", size=size
    )
    print("Total image number: ", str(len(test_ds)))

    carry = None
    for rec in device_prefetch(test_ds.iter_u8(), depth=config.prefetch_depth):
        if carry is None:
            zeros = jnp.zeros_like(rec.image)
            carry = {"last_H3": zeros, "last_s3": zeros}
        if rec.is_new_seq:
            print("Eval Get this img from: ", rec.path)
        (H2, H3, _s3), carry = predict_step(
            net_vars, raft_vars, rec.image, carry,
            jnp.asarray(rec.is_new_seq),
            of_scale=config.of_scale, raft_iters=config.raft_iters,
        )

        if config.dataset in ("RLV", "BVI-RLV", "lowlight_dataset"):
            splits = rec.path.split(os.sep)
            save_dir = os.path.join(config.save, splits[-3], splits[-2])
        else:
            # reference keys on the immediate parent dir only
            # (predict.py:99), which collides across scenes sharing a
            # subfolder name; include the scene dir as well
            parent = os.path.dirname(rec.path)
            save_dir = os.path.join(
                config.save,
                os.path.basename(os.path.dirname(parent)),
                os.path.basename(parent),
            )
        os.makedirs(save_dir, exist_ok=True)
        write_png(
            os.path.join(save_dir, rec.name + "_denoise.png"),
            np.asarray(H3)[0],
        )
        write_png(
            os.path.join(save_dir, rec.name + "_enhance.png"),
            np.asarray(H2)[0],
        )


def main(argv=None):
    parser = argparse.ArgumentParser("ZERO-TIG")
    add_config_args(parser)
    config = config_from_args(parser.parse_args(argv))
    run_predict(config)


if __name__ == "__main__":
    main()
