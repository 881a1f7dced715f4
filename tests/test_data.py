"""Data-layer tests: loader semantics, is_new_seq protocol, prefetcher."""

import os

import numpy as np
import pytest

from zero_tig_tpu.data import (
    RLVDataset,
    create_dataset,
    device_prefetch,
    gt_path_for,
    make_rlv_fixture,
    sequential_judgment,
    sort_files_by_name,
)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rlv"))
    return make_rlv_fixture(root, frames_per_scene=3, size=(32, 24))


def test_sequential_judgment_semantics():
    # same dir, consecutive -> continuation
    assert not sequential_judgment("/a/b/00002.png", "/a/b/00001.png")
    # gap -> new sequence
    assert sequential_judgment("/a/b/00003.png", "/a/b/00001.png")
    # different dir -> new sequence
    assert sequential_judgment("/a/c/00002.png", "/a/b/00001.png")
    # self-comparison (first frame) -> new sequence
    assert sequential_judgment("/a/b/00001.png", "/a/b/00001.png")


def test_sort_files_by_name():
    files = ["/x/10.png", "/x/2.png", "/x/1.png"]
    assert [os.path.basename(p) for p in sort_files_by_name(files)] == [
        "1.png", "2.png", "10.png",
    ]


def test_rlv_dataset_order_and_flags(fixture_root):
    ds = RLVDataset(fixture_root, "train", size=(32, 24))
    assert len(ds) == 6  # 2 scenes x 3 frames
    recs = list(ds)
    flags = [r.is_new_seq for r in recs]
    assert flags == [True, False, False, True, False, False]
    assert recs[0].image.shape == (24, 32, 3)
    assert recs[0].image.dtype == np.float32
    assert 0.0 <= recs[0].image.min() and recs[0].image.max() <= 1.0
    # epoch 2: previous path persists across epochs (reference quirk) -- the
    # first frame is still a new sequence because indices don't continue
    flags2 = [r.is_new_seq for r in ds]
    assert flags2[0] is True


def test_factory_and_gt_path(fixture_root):
    ds = create_dataset("RLV", fixture_root, "test", size=(32, 24))
    assert len(ds) == 6
    rec = next(iter(ds))
    gt = gt_path_for(rec.path)
    assert "gt" in gt and "normal_light_" in gt
    assert os.path.exists(gt)


def test_generic_dataset(fixture_root):
    ds = create_dataset(
        "underwater", os.path.join(fixture_root, "input"), "train",
        size=(32, 24),
    )
    assert len(ds) == 6  # recursive walk finds all input frames


def test_device_prefetch(fixture_root):
    ds = RLVDataset(fixture_root, "train", size=(32, 24))
    out = list(device_prefetch(iter(ds), depth=2))
    assert len(out) == 6
    assert out[0].image.shape == (1, 24, 32, 3)
    assert out[0].is_new_seq is True
    # device-resident
    assert hasattr(out[0].image, "devices")


def test_iter_u8_and_device_normalize(fixture_root):
    """uint8 iteration + on-device normalize must equal the float path."""
    ds_f = RLVDataset(fixture_root, "train", size=(32, 24))
    ds_u = RLVDataset(fixture_root, "train", size=(32, 24))
    recs_f = list(device_prefetch(iter(ds_f), depth=2))
    recs_u = list(device_prefetch(ds_u.iter_u8(), depth=2))
    assert len(recs_f) == len(recs_u)
    for a, b in zip(recs_f, recs_u):
        assert b.image.dtype == np.float32 or str(b.image.dtype) == "float32"
        np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))
        assert a.is_new_seq == b.is_new_seq


def test_loader_resize_matches_pil_reference(tmp_path, rng):
    """Downscaling frames must match the reference's PIL pipeline exactly
    (Image.open().convert('RGB').resize(size), antialiased-bicubic default,
    multi_read_data.py:127-132). cv2.INTER_CUBIC does NOT antialias and is
    only an opt-in (ZERO_TIG_CV2_RESIZE=1)."""
    import cv2
    from PIL import Image

    from zero_tig_tpu.data.datasets import FrameDataset

    src = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "0000.png")
    cv2.imwrite(p, src[..., ::-1])

    ds = FrameDataset([p], size=(48, 32))
    got = ds.load_image_u8(p)
    with Image.open(p) as im:
        want = np.asarray(
            im.convert("RGB").resize((48, 32), Image.Resampling.BICUBIC)
        )
    np.testing.assert_array_equal(got, want)

    # measured divergence documentation: cv2 INTER_CUBIC differs on downscale
    cv2_out = cv2.resize(src, (48, 32), interpolation=cv2.INTER_CUBIC)
    assert np.abs(cv2_out.astype(int) - want.astype(int)).max() > 2

    # no-resize case: identical bytes either way (PNG lossless)
    ds_native = FrameDataset([p], size=(96, 64))
    np.testing.assert_array_equal(ds_native.load_image_u8(p), src)
