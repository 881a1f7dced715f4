"""Multi-dataset orchestration: train -> eval chaining and skip-on-failure.

Parity: reference run_pipeline.py:110-169 control flow (in-process here).
"""

import glob
import os

import numpy as np

from zero_tig_tpu.cli.run_pipeline import find_latest_run_dir, run_dataset
from zero_tig_tpu.data import make_rlv_fixture

TINY = dict(frame_width=64, frame_height=48, of_scale=2, raft_iters=2)


def test_run_dataset_chains_train_and_eval(tmp_path):
    base = str(tmp_path / "data")
    make_rlv_fixture(os.path.join(base, "RLV"), frames_per_scene=2,
                     size=(64, 48))
    save_root = str(tmp_path / "EXP")
    metrics = run_dataset(
        "RLV", base, epochs=1, save_root=save_root, **TINY
    )
    assert metrics is not None
    assert np.isfinite(metrics["Total_PSNR"])
    assert metrics["Total_LPIPS"] is None  # null, not 0.0, when unmeasured
    run_dir = find_latest_run_dir(os.path.join(save_root, "RLV"))
    assert run_dir is not None
    assert os.path.exists(
        os.path.join(run_dir, "model_epochs", "weights_0.pt")
    )
    assert os.path.exists(os.path.join(run_dir, "results", "Metrics.json"))


def test_pipeline_main_skips_failed_dataset(tmp_path, capsys):
    """A dataset whose data dir is missing must not abort the sweep
    (reference skip-on-failure, run_pipeline.py:125-156)."""
    from zero_tig_tpu.cli.run_pipeline import main

    base = str(tmp_path / "data")
    make_rlv_fixture(os.path.join(base, "RLV"), frames_per_scene=2,
                     size=(64, 48))
    # config overrides are not on the reference CLI surface; patch the tiny
    # geometry through run_dataset's defaults via argv-less invocation
    import zero_tig_tpu.cli.run_pipeline as rp

    orig = rp.run_dataset

    def tiny_run_dataset(ds, bdd, **kw):
        kw.update(TINY)
        return orig(ds, bdd, **kw)

    rp.run_dataset, restore = tiny_run_dataset, orig
    try:
        main([
            "--datasets", "DID", "RLV",
            "--base_data_dir", base,
            "--epochs", "1",
            "--save_root", str(tmp_path / "EXP2"),
        ])
    finally:
        rp.run_dataset = restore
    out = capsys.readouterr().out
    assert "dataset DID FAILED" in out
    assert glob.glob(str(tmp_path / "EXP2" / "RLV" / "Train-*"))
