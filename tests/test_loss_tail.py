"""W-minor fast loss tail == the legacy NHWC tail (values AND gradients).

The fast-mode training loss tail (core.precision.set_loss_tail) rewrites
the Color term as ONE W-minor blur of the difference -- exact by blur
linearity + the reference's detach placement (loss.py:64) -- and computes
the Var term's two local-variance maps in one stacked W-minor pass
(loss.py:75-77). Same f32 math modulo reassociation: these tests pin the
op-level parity at 1e-6 and the end-to-end loss/gradient parity through
value_and_grad.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zero_tig_tpu.core import precision
from zero_tig_tpu.ops.filters import (
    blur,
    blur_wminor,
    calculate_local_variance,
    local_mean,
    local_variance_wminor,
    pair_downsampler,
)


@pytest.fixture(autouse=True)
def _restore():
    yield
    precision.set_precision("highest")
    precision.set_loss_tail(None)
    jax.clear_caches()


def test_blur_wminor_matches_nhwc(rng):
    x = rng.random((2, 48, 40, 3)).astype(np.float32)
    a = np.asarray(blur(jnp.asarray(x)))
    b = np.asarray(blur_wminor(jnp.asarray(x.transpose(0, 3, 1, 2))))
    np.testing.assert_allclose(a, b.transpose(0, 2, 3, 1), atol=2e-6)


def test_local_variance_wminor_matches_nhwc(rng):
    x = rng.random((1, 32, 36, 6)).astype(np.float32)
    a = np.asarray(calculate_local_variance(jnp.asarray(x)))
    b = np.asarray(
        local_variance_wminor(jnp.asarray(x.transpose(0, 3, 1, 2)))
    )
    np.testing.assert_allclose(a, b.transpose(0, 2, 3, 1), atol=2e-6)


@pytest.mark.parametrize("xpack_train", [False, True])
def test_fast_loss_and_grads_match_nhwc_tail(rng, xpack_train):
    from zero_tig_tpu.losses.zero_tig_loss import zero_tig_loss
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )
    from zero_tig_tpu.models.network import forward_train

    precision.set_precision("fast")
    precision.set_xpack_train(xpack_train)

    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jnp.asarray(rng.random((1, 16, 24, 3)).astype(np.float32) * 0.3)
    carry = {
        "last_H3": jnp.asarray(rng.random((1, 16, 24, 3)).astype(np.float32)),
        "last_s3": jnp.asarray(
            rng.random((1, 16, 24, 3)).astype(np.float32) * 0.5 + 0.25
        ),
    }

    def loss_for(tail):
        precision.set_loss_tail(tail)
        jax.clear_caches()

        def loss_fn(params):
            variables = {
                "params": params, "batch_stats": net_vars["batch_stats"]
            }
            outs, _, _ = forward_train(
                variables, raft_vars, frame, carry, jnp.asarray(False),
                of_scale=2, raft_iters=2, bn_train=True,
            )
            return zero_tig_loss(frame, outs)

        return jax.value_and_grad(loss_fn)(net_vars["params"])

    loss_n, grad_n = loss_for("nhwc")
    loss_w, grad_w = loss_for("wminor")
    precision.set_xpack_train(None)

    np.testing.assert_allclose(
        float(loss_w), float(loss_n), rtol=1e-5, atol=1e-5
    )
    for (pn, gn), (pw, gw) in zip(
        jax.tree_util.tree_leaves_with_path(grad_n),
        jax.tree_util.tree_leaves_with_path(grad_w),
    ):
        np.testing.assert_allclose(
            np.asarray(gw), np.asarray(gn), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(pn),
        )


def test_spatial_banded_path_keeps_nhwc_tail(rng):
    """The banded spatial step forces loss_tail='nhwc' even in fast mode
    (region masking needs the per-map blurs); the wminor tail + region is
    a loud error, never silent wrong numbers."""
    from zero_tig_tpu.losses.zero_tig_loss import Region, zero_tig_loss
    from zero_tig_tpu.models import init_network_variables
    from zero_tig_tpu.models.network import forward_train_core

    precision.set_precision("fast")
    precision.set_loss_tail("wminor")
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    frame = jnp.asarray(rng.random((1, 16, 24, 3)).astype(np.float32) * 0.3)
    z = jnp.zeros_like(frame)

    outs, _, _ = forward_train_core(
        net_vars, frame, z, z, bn_train=False, loss_tail="wminor"
    )
    with pytest.raises(ValueError, match="region"):
        zero_tig_loss(
            frame, outs, region=Region(0, 0, 16, 16),
            factor=jnp.ones((1, 1, 1, 1)),
            ycc=jnp.zeros_like(frame),
        )
    # the explicit override produces blur fields usable in region mode
    outs2, _, _ = forward_train_core(
        net_vars, frame, z, z, bn_train=False, loss_tail="nhwc"
    )
    assert outs2.color_blur_diff is None and outs2.H3_blur is not None


def test_res_inter_wminor_ops_match_nhwc(rng):
    """Op-level parity of the round-5 Res/Inter W-minor twins."""
    from zero_tig_tpu.ops.filters import (
        local_mean_wminor,
        local_stddev,
        local_stddev_wminor,
        pair_downsampler_wminor,
        texture_difference,
        texture_difference_wminor,
    )

    x = rng.random((2, 24, 32, 3)).astype(np.float32)
    xc = jnp.asarray(x.transpose(0, 3, 1, 2))
    a1, a2 = pair_downsampler(jnp.asarray(x))
    b1, b2 = pair_downsampler_wminor(xc)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1).transpose(0, 2, 3, 1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2).transpose(0, 2, 3, 1), atol=1e-6)

    lm = local_mean(jnp.asarray(x))
    lmw = local_mean_wminor(xc)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lmw).transpose(0, 2, 3, 1), atol=2e-6)

    sd = local_stddev(jnp.asarray(x))
    sdw = local_stddev_wminor(xc)
    np.testing.assert_allclose(np.asarray(sd), np.asarray(sdw).transpose(0, 2, 3, 1), atol=2e-5)

    y = rng.random((2, 24, 32, 3)).astype(np.float32)
    td = texture_difference(jnp.asarray(x), jnp.asarray(y))
    tdw = texture_difference_wminor(xc, jnp.asarray(y.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(td), np.asarray(tdw).transpose(0, 2, 3, 1), atol=0)
