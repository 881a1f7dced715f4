"""Sequential video-frame datasets.

Parity: dataloader/multi_read_data.py + dataloader/create_data.py. Loaders
yield frames in temporal order per scene; every frame is resized to
1920x1080 (multi_read_data.py:129, configurable here) and normalized to
[0, 1]. Instead of the reference's mutable ``last_data_name_path`` +
host-side ``sequential_judgment`` (utils/utils.py:145-160), each record
carries a precomputable ``is_new_seq`` flag with identical semantics
(including the quirk that the very first record compares against itself and
is always a new sequence, and that the previous path persists across
epochs).

The broken reference ``DefaultDataset`` (multi_read_data.py:29-71 -- its
documented ``--dataset underwater`` path crashes) is replaced by a WORKING
generic recursive loader with the same intended behavior.

Decoding/resizing defaults to PIL for exact reference parity
(multi_read_data.py:127-132 -- PIL's default resample is antialiased
bicubic, which cv2.INTER_CUBIC does NOT match on downscale); set
ZERO_TIG_CV2_RESIZE=1 or ZERO_TIG_NATIVE_IO=1 for the faster cv2/C++
decode paths (identical when frames are already at target size).
"""

from __future__ import annotations

import glob
import os
import re
from dataclasses import dataclass
from typing import Iterator

import cv2
import numpy as np

cv2.setNumThreads(0)  # the prefetcher manages threading (frame_utils.py:7-8)


@dataclass
class FrameRecord:
    image: np.ndarray  # (H, W, 3) float32 in [0, 1], RGB
    name: str  # file stem
    path: str
    is_new_seq: bool


def extract_number(filename: str) -> int:
    stem = os.path.splitext(os.path.split(filename)[1])[0]
    m = re.search(r"\d+", stem)
    return int(m.group()) if m else 0


def sort_files_by_name(paths: list[str]) -> list[str]:
    return sorted(paths, key=extract_number)


def sequential_judgment(img_path: str, last_img_path: str) -> bool:
    """New-sequence detector. Parity: utils/utils.py:145-160 (same dir AND
    numeric stem == last+1 -> continuation; anything else -> new sequence).
    Non-numeric stems count as index 0 rather than asserting."""
    img_dir, img_name = os.path.split(img_path)
    last_dir, last_name = os.path.split(last_img_path)
    if img_dir != last_dir:
        return True
    try:
        img_idx = int(os.path.splitext(img_name)[0])
        last_idx = int(os.path.splitext(last_name)[0])
    except ValueError:
        img_idx = extract_number(img_name)
        last_idx = extract_number(last_name)
    return img_idx != last_idx + 1


class FrameDataset:
    """Ordered frame-path list + stateful sequential iteration."""

    name = "generic"

    def __init__(
        self,
        paths: list[str],
        *,
        size: tuple[int, int] = (1920, 1080),  # (W, H), PIL convention
        interpolation: int = cv2.INTER_CUBIC,
        native: bool | None = None,
    ):
        if not paths:
            raise ValueError("dataset is empty")
        self.paths = paths
        self.size = size
        self.interpolation = interpolation
        self._last_path = paths[0]  # persists across epochs (reference quirk)
        if native is None:
            native = os.environ.get("ZERO_TIG_NATIVE_IO", "0") == "1"
        self.native = native
        # PIL decode+resize is the reference-parity default (see
        # load_image_u8); cv2 and the native C++ loader are speed opt-ins
        self._use_pil = os.environ.get("ZERO_TIG_CV2_RESIZE", "0") != "1"
        if self.native:
            from .. import native as native_mod

            if not native_mod.available():
                self.native = False

    def __len__(self) -> int:
        return len(self.paths)

    def load_image_u8(self, path: str) -> np.ndarray:
        """Decoded + resized frame as (H, W, 3) uint8 RGB (pre-normalize).

        Resize parity: the reference decodes AND resizes with PIL
        (Image.open(...).convert('RGB').resize((1920, 1080)),
        multi_read_data.py:127-132); PIL's default resample is ANTIALIASED
        bicubic, which differs from cv2.INTER_CUBIC on any actual
        downscale (cv2 does not antialias; measured ~28 dB apart on
        detailed content). Frames already at the target size decode
        identically either way (PNG is lossless), so BVI-RLV at native
        1920x1080 is unaffected. Default is the PIL path for parity;
        ZERO_TIG_CV2_RESIZE=1 opts into the faster cv2 path.
        """
        if self._use_pil:
            from PIL import Image

            with Image.open(path) as im:
                im = im.convert("RGB")
                if im.size != self.size:
                    im = im.resize(self.size, Image.Resampling.BICUBIC)
                return np.asarray(im, np.uint8)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if (img.shape[1], img.shape[0]) != self.size:
            img = cv2.resize(img, self.size, interpolation=self.interpolation)
        return img

    def load_image(self, path: str) -> np.ndarray:
        if self.native:
            # C++ libpng/libjpeg decode + bicubic resize (float path:
            # matches cv2.INTER_CUBIC on float inputs to ~3e-7; cv2's
            # uint8 fixed-point path saturates intermediates and can
            # differ by a few levels at sharp edges)
            from .. import native as native_mod

            return native_mod.load_frame(path, self.size[0], self.size[1])
        return self.load_image_u8(path).astype(np.float32) / 255.0

    def __iter__(self) -> Iterator[FrameRecord]:
        for path in self.paths:
            is_new = sequential_judgment(path, self._last_path)
            self._last_path = path
            yield FrameRecord(
                image=self.load_image(path),
                name=os.path.splitext(os.path.basename(path))[0],
                path=path,
                is_new_seq=is_new,
            )

    def iter_u8(self) -> Iterator[FrameRecord]:
        """Like __iter__ but images stay uint8 (normalize on device; see
        data.prefetch.device_prefetch transfer_uint8). Skips the host-side
        float conversion entirely -- on a relayed TPU the uint8 H2D path is
        ~4-100x cheaper. Native-IO datasets use the C++ pipeline's uint8
        output mode (ordered multi-threaded decode; frames already at
        target size are a straight memcpy of the decoded bytes), so the
        native path now composes with the uint8 transfer instead of being
        excluded by the relay's pathological float H2D (round-2 finding,
        BASELINE.md)."""
        if self.native:
            from .. import native as native_mod

            pipe = native_mod.NativePipeline(
                self.paths, self.size[0], self.size[1],
                threads=max(os.cpu_count() or 1, 1), out_u8=True,
            )
            try:
                for path, image in zip(self.paths, pipe):
                    is_new = sequential_judgment(path, self._last_path)
                    self._last_path = path
                    yield FrameRecord(
                        image=image,
                        name=os.path.splitext(os.path.basename(path))[0],
                        path=path,
                        is_new_seq=is_new,
                    )
            finally:
                pipe.close()
            return
        for path in self.paths:
            is_new = sequential_judgment(path, self._last_path)
            self._last_path = path
            yield FrameRecord(
                image=self.load_image_u8(path),
                name=os.path.splitext(os.path.basename(path))[0],
                path=path,
                is_new_seq=is_new,
            )


def _read_phase_list(root: str, list_file: str) -> list[str]:
    with open(os.path.join(root, list_file)) as f:
        lines = [ln.strip() for ln in f.readlines()]
    scenes = [ln for ln in lines if ln]
    if not scenes:
        raise ValueError(f"No input data in {list_file}.")
    return scenes


class RLVDataset(FrameDataset):
    """BVI-RLV: input/<scene>/low_light_{10,20}/*.png per {train,test}_list.txt.

    Parity: RLVDataLoader (multi_read_data.py:74-147).
    """

    name = "BVI-RLV"

    def __init__(self, root: str, task: str, **kw):
        assert task in ("train", "test"), f"Invalid phase: {task}"
        paths: list[str] = []
        for scene in _read_phase_list(root, f"{task}_list.txt"):
            for sub in ("low_light_10", "low_light_20"):
                paths.extend(
                    sort_files_by_name(
                        glob.glob(os.path.join(root, "input", scene, sub, "*.png"))
                    )
                )
        super().__init__(paths, **kw)


class DIDDataset(FrameDataset):
    """DID: input/<scene>/*.{jpg,png}. Parity: DidDataloader
    (multi_read_data.py:150-210)."""

    name = "DID"

    def __init__(self, root: str, task: str, **kw):
        assert task in ("train", "test"), f"Invalid phase: {task}"
        paths: list[str] = []
        for scene in _read_phase_list(root, f"{task}_list.txt"):
            files = glob.glob(os.path.join(root, "input", scene, "*.jpg"))
            files += glob.glob(os.path.join(root, "input", scene, "*.png"))
            paths.extend(sort_files_by_name(files))
        super().__init__(paths, **kw)


class SDSDDataset(FrameDataset):
    """SDSD: indoor/outdoor auto-detect, one low-light frame per pair dir.

    Parity: SDSDDataloader (multi_read_data.py:213-335).
    """

    name = "SDSD"

    def __init__(self, root: str, task: str, **kw):
        assert task in ("train", "test"), f"Invalid phase: {task}"
        paths: list[str] = []
        for subset, prefix in (("indoor", "in"), ("outdoor", "out")):
            subset_dir = os.path.join(root, subset, f"{subset}_png")
            list_path = os.path.join(root, f"sdsd_{prefix}_{task}.txt")
            if not (os.path.isdir(subset_dir) and os.path.exists(list_path)):
                continue
            subset_paths = []
            for line in open(list_path):
                pair = line.strip()
                if not pair:
                    continue
                pair_dir = os.path.join(subset_dir, pair)
                if not os.path.isdir(pair_dir):
                    continue
                files = glob.glob(os.path.join(pair_dir, "*.png"))
                files += glob.glob(os.path.join(pair_dir, "*.jpg"))
                low = next(
                    (
                        f
                        for f in files
                        if "gt" not in f.lower() and "normal" not in f.lower()
                    ),
                    files[0] if files else None,
                )
                if low:
                    subset_paths.append(low)
            paths.extend(sort_files_by_name(subset_paths))
        super().__init__(paths, **kw)


class GenericDataset(FrameDataset):
    """Recursive walk of an input directory (the *fixed* underwater/default
    loader -- the reference's is broken, multi_read_data.py:29-71)."""

    name = "generic"

    def __init__(self, root: str, task: str = "train", **kw):
        assert os.path.exists(root), "Input directory does not exist!"
        paths = []
        for r, _dirs, names in os.walk(root):
            for n in sorted(names):
                if n.startswith("."):
                    continue
                if os.path.splitext(n)[1].lower() in (".png", ".jpg", ".jpeg", ".bmp"):
                    paths.append(os.path.join(r, n))
        super().__init__(sort_files_by_name(paths), **kw)


def create_dataset(
    dataset: str,
    root: str,
    task: str,
    *,
    size: tuple[int, int] = (1920, 1080),
) -> FrameDataset:
    """Dataset factory. Parity: CreateDataset (dataloader/create_data.py:3-18)."""
    if dataset in ("lowlight_dataset", "RLV", "BVI-RLV"):
        return RLVDataset(root, task, size=size)
    if dataset in ("DID", "DID_1080"):
        return DIDDataset(root, task, size=size)
    if dataset in ("SDSD", "3_SDSD"):
        return SDSDDataset(root, task, size=size)
    return GenericDataset(root, task, size=size)


def gt_path_for(input_path: str) -> str:
    """GT located by path convention (evals.py:133)."""
    return input_path.replace("input", "gt").replace("low_light_", "normal_light_")
