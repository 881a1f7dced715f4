"""Streaming service: incremental processing, sequence detection across
arrivals, restart idempotence."""

import glob
import json
import os
import threading
import time

import numpy as np
import pytest

from zero_tig_tpu.core.config import Config
from zero_tig_tpu.data import make_rlv_fixture


@pytest.fixture()
def inbox(tmp_path):
    root = str(tmp_path / "rlv")
    make_rlv_fixture(root, frames_per_scene=3, size=(64, 48))
    return os.path.join(root, "input")


TINY = dict(frame_width=64, frame_height=48, of_scale=2, raft_iters=2)


def test_serve_processes_then_resumes(inbox, tmp_path):
    from zero_tig_tpu.cli.serve import run_serve

    cfg = Config(lowlight_images_path=inbox, save=str(tmp_path / "out"), **TINY)

    # frame 2 of scene S01 arrives late, while the service is running
    late = sorted(glob.glob(os.path.join(inbox, "S01", "*", "*.png")))[-1]
    staging = late + ".staged"
    os.rename(late, staging)

    def count_outputs():
        return len(glob.glob(str(tmp_path / "out" / "**" / "*_denoise.png"),
                             recursive=True))

    def deliver():
        # event-driven: hand over the late frame only once the service has
        # worked through the initial backlog, then stop it after it lands
        deadline = time.time() + 300
        while count_outputs() < 5 and time.time() < deadline:
            time.sleep(0.3)
        os.rename(staging, late)
        while count_outputs() < 6 and time.time() < deadline:
            time.sleep(0.3)
        open(os.path.join(inbox, "STOP"), "w").close()

    t = threading.Thread(target=deliver)
    t.start()
    n = run_serve(cfg, poll_sec=0.2, settle_sec=0.0, max_idle_sec=240.0)
    t.join()

    assert n == 6
    outs = glob.glob(str(tmp_path / "out" / "**" / "*_denoise.png"),
                     recursive=True)
    assert len(outs) == 6
    with open(str(tmp_path / "out" / "manifest.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert len(records) == 6
    # per-scene continuation: first frame of each scene is a new sequence,
    # the rest are continuations -- including the late-arriving frame
    by_scene = {}
    for r in records:
        by_scene.setdefault(r["scene"], []).append(r)
    for scene, rs in by_scene.items():
        rs = sorted(rs, key=lambda r: r["index"])
        assert rs[0]["new_seq"] is True
        assert all(r["new_seq"] is False for r in rs[1:]), scene

    # restart: nothing new -> nothing reprocessed, fast idle exit
    os.remove(os.path.join(inbox, "STOP"))
    n2 = run_serve(cfg, poll_sec=0.1, settle_sec=0.0, max_idle_sec=0.5)
    assert n2 == 0
