"""Double-buffered host->device frame prefetching.

The reference blocks on PIL decode -> ToTensor -> .cuda() for every frame
(multi_read_data.py:127-132, train.py:125). Here a background thread decodes
and stages the next frames while the device computes the current one, and
``jax.device_put`` is issued ahead of use so the H2D DMA (~24 MB/frame at
1080p f32) overlaps compute. Named explicitly in the BASELINE.json north
star.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .datasets import FrameRecord


class DeviceRecord:
    """A frame already resident on device."""

    __slots__ = ("image", "name", "path", "is_new_seq")

    def __init__(self, image, name, path, is_new_seq):
        self.image = image  # (1, H, W, 3) jax array on device
        self.name = name
        self.path = path
        self.is_new_seq = is_new_seq


def device_prefetch(
    records: Iterable[FrameRecord],
    *,
    depth: int = 2,
    device=None,
    dtype=jnp.float32,
    transfer_uint8: bool = True,
) -> Iterator[DeviceRecord]:
    """Iterate records with a decode thread + `depth`-deep device staging.

    transfer_uint8 (default): records whose image is ALREADY uint8 (see
    FrameDataset.iter_u8) ship as uint8 and normalize to [0, 1] float ON
    DEVICE -- 4x less H2D traffic, and on this image's relayed TPU the
    float transfer path is pathologically slow (~100x; measured in
    BASELINE.md). Bit-identical to host-side /255 (f32 division is exact
    either way). Float records ship verbatim.
    """
    if device is None:
        device = jax.devices()[0]

    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    error: list[BaseException] = []

    def worker():
        try:
            for rec in records:
                img = np.asarray(rec.image)[None]  # (1, H, W, 3)
                if transfer_uint8 and img.dtype == np.uint8:
                    dev = jax.device_put(jnp.asarray(img), device)
                    dev = dev.astype(dtype) / 255.0  # on-device normalize
                else:
                    dev = jax.device_put(jnp.asarray(img, dtype), device)
                q.put(DeviceRecord(dev, rec.name, rec.path, rec.is_new_seq))
        except BaseException as e:  # surfaced to the consumer
            error.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item


class ChunkRecord:
    """K consecutive frames staged for one lax.scan dispatch."""

    __slots__ = ("images", "flags", "records")

    def __init__(self, images, flags, records):
        self.images = images  # (K, B, H, W, 3) on device
        self.flags = flags  # (K,) bool on device
        self.records = records  # list[DeviceRecord] for names/paths


def chunk_records(
    records: Iterable[DeviceRecord], k: int
) -> Iterator[ChunkRecord | DeviceRecord]:
    """Group device records into ChunkRecords of exactly ``k`` frames.

    Streaming order is preserved; the trailing partial group is yielded as
    the individual DeviceRecords so callers fall back to the per-frame step
    (avoids advancing train/opt state on padding frames).
    """
    if k <= 1:
        yield from records
        return
    buf: list[DeviceRecord] = []
    for rec in records:
        buf.append(rec)
        if len(buf) == k:
            yield ChunkRecord(
                jnp.stack([r.image for r in buf]),
                jnp.asarray([r.is_new_seq for r in buf]),
                buf,
            )
            buf = []
    yield from buf
