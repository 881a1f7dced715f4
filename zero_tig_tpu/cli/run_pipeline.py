"""Multi-dataset orchestration. Parity: reference run_pipeline.py.

For each dataset: train -> locate newest Train-* run -> eval the final
epoch's weights -> pretty-print Metrics.json (run_pipeline.py:110-169).
Runs in-process (one JAX runtime) instead of subprocess-chaining python
scripts -- same control flow, no process churn; per-dataset failures are
caught and reported like the reference's skip-on-failure.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import traceback

from ..core.config import Config
from .evals import run_evals
from .train import run_training

# dataset-name -> loader type map (run_pipeline.py:10-21)
DATASET_TYPES = {
    "RLV": "RLV",
    "BVI-RLV": "RLV",
    "lowlight_dataset": "RLV",
    "DID": "DID",
    "DID_1080": "DID",
    "SDSD": "SDSD",
    "3_SDSD": "SDSD",
    "underwater": "underwater",
}


def find_latest_run_dir(base: str) -> str | None:
    runs = sorted(glob.glob(os.path.join(base, "Train-*")))
    return runs[-1] if runs else None


def run_dataset(
    dataset: str,
    base_data_dir: str,
    *,
    epochs: int = 5,
    model_pretrain: str | None = None,
    raft_weights: str | None = None,
    save_root: str = "./EXP",
    lpips_weights: str | None = None,
    **config_overrides,
) -> dict | None:
    data_dir = os.path.join(base_data_dir, dataset)
    cfg = Config(
        dataset=dataset,
        lowlight_images_path=data_dir,
        epochs=epochs,
        model_pretrain=model_pretrain,
        raft_weights=raft_weights,
        save=os.path.join(save_root, dataset),
        **config_overrides,
    )
    run_dir = run_training(cfg)

    weights = os.path.join(run_dir, "model_epochs", f"weights_{epochs - 1}.pt")
    eval_cfg = Config(
        dataset=dataset,
        lowlight_images_path=data_dir,
        model_pretrain=weights,
        raft_weights=raft_weights,
        save=os.path.join(run_dir, "results"),
        **config_overrides,
    )
    return run_evals(eval_cfg, lpips_weights=lpips_weights)


def main(argv=None):
    parser = argparse.ArgumentParser("ZERO-TIG pipeline")
    parser.add_argument("--datasets", nargs="+", required=True)
    parser.add_argument("--base_data_dir", type=str, required=True)
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--model_pretrain", type=str, default=None)
    parser.add_argument("--raft_weights", type=str, default=None)
    parser.add_argument("--save_root", type=str, default="./EXP")
    parser.add_argument("--lpips_weights", type=str, default=None)
    args = parser.parse_args(argv)

    results = {}
    for ds in args.datasets:
        try:
            metrics = run_dataset(
                ds, args.base_data_dir,
                epochs=args.epochs,
                model_pretrain=args.model_pretrain,
                raft_weights=args.raft_weights,
                save_root=args.save_root,
                lpips_weights=args.lpips_weights,
            )
            results[ds] = metrics
        except Exception:
            print(f"[run_pipeline] dataset {ds} FAILED:")
            traceback.print_exc()
            results[ds] = None

    try:
        import pandas as pd

        print(pd.DataFrame(results).T)
    except ImportError:
        print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
