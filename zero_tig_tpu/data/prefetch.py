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


def chunk_prefetch(
    records: Iterable[FrameRecord],
    k: int,
    *,
    depth: int = 2,
    device=None,
    dtype=jnp.float32,
) -> Iterator[ChunkRecord | DeviceRecord]:
    """Decode-and-stage WHOLE CHUNKS: one H2D transfer per K frames.

    device_prefetch + chunk_records pays ~2 relay dispatches per frame
    (device_put + on-device /255) plus a K-way jnp.stack per chunk; at the
    relay's ~25-40 ms/dispatch tax (CLAUDE.md) that is ~60-70 ms/frame of
    pure dispatch overhead on the streaming path -- the round-5 banded-BN
    lesson applied to IO. Here the decode thread np.stacks K uint8 frames
    on the HOST (cheap, no GIL contention with the relay wait), issues ONE
    device_put of the (K, 1, H, W, 3) uint8 block per chunk, and ONE
    on-device astype/255 -- 4 dispatches per chunk instead of ~2K+3, all
    issued from the prefetch thread so they overlap the consumer's step
    wait. The eager normalize keeps the downstream jitted program
    IDENTICAL to f32-staged frames (bitwise; the steps' in-graph uint8
    normalize is reassociation-level approximate, see
    pipeline.steps._norm_frames).

    ChunkRecord.records are the host FrameRecords (consumers read only
    .name/.path/.is_new_seq from full chunks). The trailing partial group
    is yielded as per-frame DeviceRecords (normalized ``dtype``, exactly
    like device_prefetch) so callers fall back to the per-frame step.
    Float records (non-uint8 sources) ship as one ``dtype`` block instead.
    """
    if k <= 1:
        yield from device_prefetch(
            records, depth=depth, device=device, dtype=dtype
        )
        return
    if device is None:
        device = jax.devices()[0]

    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    error: list[BaseException] = []

    def stage_chunk(buf: list[FrameRecord]) -> ChunkRecord:
        imgs = np.stack([np.asarray(r.image) for r in buf])[:, None]
        if imgs.dtype == np.uint8:
            images = jax.device_put(jnp.asarray(imgs), device)
            images = images.astype(dtype) / 255.0  # one on-device normalize
        else:
            images = jax.device_put(jnp.asarray(imgs, dtype), device)
        flags = jax.device_put(
            jnp.asarray([r.is_new_seq for r in buf]), device
        )
        return ChunkRecord(images, flags, list(buf))

    def stage_frame(rec: FrameRecord) -> DeviceRecord:
        img = np.asarray(rec.image)[None]
        if img.dtype == np.uint8:
            dev = jax.device_put(jnp.asarray(img), device)
            dev = dev.astype(dtype) / 255.0
        else:
            dev = jax.device_put(jnp.asarray(img, dtype), device)
        return DeviceRecord(dev, rec.name, rec.path, rec.is_new_seq)

    def worker():
        try:
            buf: list[FrameRecord] = []
            for rec in records:
                buf.append(rec)
                if len(buf) == k:
                    q.put(stage_chunk(buf))
                    buf = []
            for rec in buf:  # trailing partial: per-frame fallback records
                q.put(stage_frame(rec))
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
