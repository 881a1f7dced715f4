"""chunk_prefetch staging == device_prefetch + chunk_records, bit-exact.

The streaming path used to pay ~2 relay dispatches per frame (device_put +
on-device /255) plus a K-way jnp.stack per chunk; chunk_prefetch ships ONE
uint8 block per chunk and normalizes once on-device, so the downstream
jitted program is byte-for-byte the f32-staged one -- every output must be
BITWISE identical. The steps' in-graph uint8 path (_norm_frames) is
additionally covered at reassociation tolerance (~2e-7: moving the /255
inside the program perturbs XLA fusion choices).

Parity: the reference decodes+normalizes per frame on the host
(multi_read_data.py:127-132); staging is ours to design.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zero_tig_tpu.data.datasets import FrameRecord
from zero_tig_tpu.data.prefetch import (
    ChunkRecord,
    DeviceRecord,
    chunk_prefetch,
    chunk_records,
    device_prefetch,
)
from zero_tig_tpu.models import init_network_variables, init_raft_variables
from zero_tig_tpu.pipeline import predict_chunk, train_chunk
from zero_tig_tpu.pipeline.steps import init_train_state
from zero_tig_tpu.core.config import Config


H, W = 32, 40


def _records(n, *, h=H, w=W, seed=3):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        recs.append(
            FrameRecord(
                image=img, name=f"f{i:03d}", path=f"/x/f{i:03d}.png",
                is_new_seq=(i == 0),
            )
        )
    return recs


def test_chunk_prefetch_shapes_and_trailing():
    recs = _records(7)
    items = list(chunk_prefetch(recs, 3))
    # 2 full chunks of 3 + 1 trailing frame as a DeviceRecord
    assert isinstance(items[0], ChunkRecord)
    assert isinstance(items[1], ChunkRecord)
    assert isinstance(items[2], DeviceRecord)
    assert items[0].images.shape == (3, 1, H, W, 3)
    assert items[0].images.dtype == jnp.float32
    assert list(np.asarray(items[0].flags)) == [True, False, False]
    assert [r.name for r in items[0].records] == ["f000", "f001", "f002"]
    assert [r.path for r in items[1].records] == [
        "/x/f003.png", "/x/f004.png", "/x/f005.png"
    ]
    # trailing frame: normalized f32, like device_prefetch
    assert items[2].image.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(items[2].image[0]),
        recs[6].image.astype(np.float32) / 255.0,
    )
    # staged values are the exact same f32 division as device_prefetch
    np.testing.assert_array_equal(
        np.asarray(items[0].images[1, 0]),
        recs[1].image.astype(np.float32) / 255.0,
    )


def test_chunk_prefetch_k1_degenerates_to_frames():
    items = list(chunk_prefetch(_records(3), 1))
    assert all(isinstance(it, DeviceRecord) for it in items)
    assert items[0].image.dtype == jnp.float32


def test_predict_chunk_staging_bitwise_equal():
    recs = _records(4)
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    zeros = jnp.zeros((1, H, W, 3), jnp.float32)

    old = list(chunk_records(device_prefetch(iter(recs), depth=2), 4))[0]
    new = list(chunk_prefetch(iter(recs), 4))[0]

    # staged blocks themselves are bitwise equal -> one shared jit entry
    np.testing.assert_array_equal(np.asarray(old.images), np.asarray(new.images))

    (a2, a3, _), ca = predict_chunk(
        net_vars, raft_vars, old.images,
        {"last_H3": zeros, "last_s3": zeros}, old.flags,
        of_scale=2, raft_iters=2,
    )
    (b2, b3, _), cb = predict_chunk(
        net_vars, raft_vars, new.images,
        {"last_H3": zeros, "last_s3": zeros}, new.flags,
        of_scale=2, raft_iters=2,
    )
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(a3), np.asarray(b3))
    np.testing.assert_array_equal(
        np.asarray(ca["last_H3"]), np.asarray(cb["last_H3"])
    )


def test_predict_chunk_raw_u8_close():
    """The in-graph uint8 normalize (_norm_frames) is reassociation-level
    approximate: assert tight closeness, not equality."""
    recs = _records(4)
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    zeros = jnp.zeros((1, H, W, 3), jnp.float32)

    f32 = list(chunk_prefetch(iter(recs), 4))[0]
    u8 = jnp.asarray(np.stack([r.image for r in recs])[:, None])
    assert u8.dtype == jnp.uint8

    (a2, a3, _), _ = predict_chunk(
        net_vars, raft_vars, f32.images,
        {"last_H3": zeros, "last_s3": zeros}, f32.flags,
        of_scale=2, raft_iters=2,
    )
    (b2, b3, _), _ = predict_chunk(
        net_vars, raft_vars, u8,
        {"last_H3": zeros, "last_s3": zeros}, f32.flags,
        of_scale=2, raft_iters=2,
    )
    np.testing.assert_allclose(np.asarray(a3), np.asarray(b3), atol=2e-6)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), atol=2e-6)


def test_train_chunk_staging_bitwise_equal():
    recs = _records(3, seed=11)
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    cfg = Config()
    state = init_train_state(cfg, net_vars, (1, H, W, 3))

    old = list(chunk_records(device_prefetch(iter(recs), depth=2), 3))[0]
    new = list(chunk_prefetch(iter(recs), 3))[0]

    sa, la = train_chunk(
        state, raft_vars, old.images, old.flags, of_scale=2, raft_iters=2
    )
    sb, lb = train_chunk(
        state, raft_vars, new.images, new.flags, of_scale=2, raft_iters=2
    )
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    pa = jax.tree_util.tree_leaves(sa.params)
    pb = jax.tree_util.tree_leaves(sb.params)
    for x, y in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_chunk_prefetch_propagates_decode_errors():
    def bad_iter():
        yield from _records(2)
        raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        list(chunk_prefetch(bad_iter(), 2))
