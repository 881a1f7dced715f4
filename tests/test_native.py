"""Native C++ frame-IO tests (skipped when the toolchain is unavailable)."""

import os

import cv2
import numpy as np
import pytest

from zero_tig_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native frameio: {native.build_error()}"
)


@pytest.fixture
def png_path(tmp_path, rng):
    img = (rng.random((30, 44, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "a.png")
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return p, img


def test_load_frame_matches_cv2_float_cubic(png_path):
    p, img = png_path
    out = native.load_frame(p, 64, 48)
    ref = cv2.resize(
        img.astype(np.float32) / 255.0, (64, 48),
        interpolation=cv2.INTER_CUBIC,
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_load_frame_identity(png_path):
    p, img = png_path
    out = native.load_frame(p, 44, 30)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)


def test_load_frame_bilinear(png_path):
    p, img = png_path
    out = native.load_frame(p, 64, 48, mode=native.MODE_BILINEAR)
    ref = cv2.resize(
        img.astype(np.float32) / 255.0, (64, 48),
        interpolation=cv2.INTER_LINEAR,
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_jpeg_decode(tmp_path, rng):
    img = (rng.random((20, 24, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "a.jpg")
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 100])
    out = native.load_frame(p, 24, 20)
    ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.float32) / 255
    np.testing.assert_allclose(out, ref, atol=0.02)  # codec tolerance


def test_pipeline_ordered(tmp_path, rng):
    paths = []
    imgs = []
    for i in range(7):
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / f"{i}.png")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(p)
        imgs.append(img)
    pipe = native.NativePipeline(paths, 16, 16, threads=3, capacity=2)
    outs = list(pipe)
    pipe.close()
    assert len(outs) == 7
    for o, img in zip(outs, imgs):
        np.testing.assert_allclose(o, img.astype(np.float32) / 255, atol=1e-6)


def test_pipeline_decode_error(tmp_path):
    bad = str(tmp_path / "bad.png")
    with open(bad, "w") as f:
        f.write("not a png")
    pipe = native.NativePipeline([bad], 8, 8)
    with pytest.raises(IOError):
        next(pipe)
    pipe.close()


def test_dataset_native_flag(tmp_path, rng):
    from zero_tig_tpu.data import make_rlv_fixture
    from zero_tig_tpu.data.datasets import RLVDataset

    root = make_rlv_fixture(str(tmp_path / "rlv"), frames_per_scene=2,
                            size=(32, 24))
    ds = RLVDataset(root, "train", size=(32, 24), native=True)
    assert ds.native
    rec = next(iter(ds))
    assert rec.image.shape == (24, 32, 3)
    assert rec.image.dtype == np.float32


def test_native_u8_oneshot_and_pipeline(tmp_path):
    """uint8 output mode: native-size frames are byte-exact with the PNG
    bytes; the u8 pipeline yields the same frames in order."""
    native = pytest.importorskip("zero_tig_tpu.native")
    if not native.available():
        pytest.skip(f"native frameio unavailable: {native.build_error()}")
    import cv2

    rng = np.random.default_rng(5)
    paths = []
    for i in range(4):
        img = rng.integers(0, 256, (24, 32, 3), np.uint8)
        p = str(tmp_path / f"{i:03d}.png")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(p)

    # native-size: straight memcpy of the decoded bytes
    ref = cv2.cvtColor(cv2.imread(paths[0]), cv2.COLOR_BGR2RGB)
    got = native.load_frame_u8(paths[0], 32, 24)
    np.testing.assert_array_equal(got, ref)

    # resized: u8 == quantized float path
    f = native.load_frame(paths[0], 16, 12)
    u = native.load_frame_u8(paths[0], 16, 12)
    np.testing.assert_array_equal(
        u, np.clip(f * 255.0 + 0.5, 0, 255).astype(np.uint8)
    )

    pipe = native.NativePipeline(paths, 32, 24, threads=2, out_u8=True)
    outs = list(pipe)
    pipe.close()
    assert len(outs) == 4
    for p, o in zip(paths, outs):
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        assert o.dtype == np.uint8
        np.testing.assert_array_equal(o, ref)
