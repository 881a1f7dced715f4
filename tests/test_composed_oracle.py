"""Composed-forward reference oracle: run the reference ``Network`` /
``Finetunemodel`` END TO END (torch, CPU) against our ``forward_train`` /
``forward_inference`` over a multi-frame sequence, weight-for-weight.

This certifies the full composition in one shot: detach placement, BN mode
plumbing, the carry/update_H3 protocol, the H2-as-warped-prev new-sequence
quirk, the equalize->RAFT->warp cache update, the 17-term loss, and the
combined-checkpoint round trip (our random weights -> .pt -> reference).

The reference's ``model/model.py:8`` imports torchvision (absent in this
image), so a stub module is injected exposing
``transforms.functional.equalize`` implemented here in torch with the
documented torchvision LUT algorithm (the same algorithm our
``ops/equalize.py`` is golden-tested against) -- the same monkeypatch spirit
as the ``torch.Tensor.cuda`` identity patch.

Known reference bug handled deliberately: ``Finetunemodel.load_state_dict``
runs before ``self.raft`` exists, so raft.* keys are silently dropped and
reference inference RAFT would run with random init (model/model.py:272-286,
SURVEY 2.2). Our framework fixes this (PARITY.md); the oracle loads the RAFT
weights into the reference explicitly post-construction so both sides run
the same (fixed) semantics.

Sizes: flow-res inputs must be >= 128 px per side or the reference RAFT
NaNs (coarsest corr level 1x1 -> division by zero in bilinear_sampler), so
frames are 128x128 with of_scale=1. RAFT iters stay 12 (hardcoded in the
reference update_cache, model/model.py:245).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _torch_equalize(img: "torch.Tensor") -> "torch.Tensor":
    """torchvision.transforms.functional.equalize for uint8 (B, C, H, W).

    Documented algorithm (per image, per channel): 256-bin histogram;
    step = (total - count(last nonzero bin)) // 255; identity when step == 0;
    lut[i] = (cumsum(hist)[i-1] + step // 2) // step, clamped to [0, 255],
    lut[0] = step // 2 // step via the pad-left-then-drop-last shift.
    """

    def scale_channel(chan: torch.Tensor) -> torch.Tensor:
        hist = torch.histc(chan.to(torch.float32), bins=256, min=0, max=255)
        nonzero = hist[hist != 0]
        step = torch.div(nonzero[:-1].sum(), 255, rounding_mode="floor")
        if step == 0:
            return chan
        lut = torch.div(
            torch.cumsum(hist, 0) + torch.div(step, 2, rounding_mode="floor"),
            step,
            rounding_mode="floor",
        )
        lut = torch.nn.functional.pad(lut, [1, 0])[:-1].clamp(0, 255)
        return lut[chan.to(torch.int64)].to(torch.uint8)

    flat = img.reshape(-1, img.shape[-2], img.shape[-1])
    out = torch.stack([scale_channel(c) for c in flat])
    return out.reshape(img.shape)


@pytest.fixture(scope="module", autouse=True)
def ref_env():
    """Reference on sys.path + torchvision stub + CPU patches."""
    sys.path.insert(0, REF)

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    fn = types.ModuleType("torchvision.transforms.functional")
    fn.equalize = _torch_equalize
    tr.functional = fn
    tv.transforms = tr
    saved_tv = {
        k: sys.modules.get(k)
        for k in ("torchvision", "torchvision.transforms",
                  "torchvision.transforms.functional")
    }
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = fn

    cuda_orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    load_orig = torch.load

    def cpu_load(*a, **k):
        k["map_location"] = "cpu"  # reference hardcodes 'cuda:0' (model.py:272)
        k.setdefault("weights_only", False)
        return load_orig(*a, **k)

    torch.load = cpu_load
    yield
    torch.load = load_orig
    torch.Tensor.cuda = cuda_orig
    for k, v in saved_tv.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v
    sys.path.remove(REF)
    for m in list(sys.modules):
        if m in ("loss", "utils", "model") or m.startswith(("utils.", "model.")):
            del sys.modules[m]


def _nchw(a: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def _nhwc(t: "torch.Tensor") -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _args(dataset="RLV", model_pretrain=None):
    import argparse

    return argparse.Namespace(
        dataset=dataset,
        of_scale=1,
        model_pretrain=model_pretrain,
        small=False,
        dropout=0.0,
        alternate_corr=False,
        mixed_precision=False,
    )


def _frames(n=3, h=128, w=128):
    """A slowly panning low-light sequence (real flow between frames)."""
    rng = np.random.default_rng(11)
    base = rng.uniform(0.02, 0.5, (h + 8, w + 8, 3)).astype(np.float32)
    # smooth the texture a little so flow is findable
    k = np.ones((3, 3), np.float32) / 9.0
    import cv2

    base = cv2.filter2D(base, -1, k)
    out = []
    for i in range(n):
        out.append(base[i : i + h, 2 * i : 2 * i + w][None])
    return out


def _variables():
    import jax

    from zero_tig_tpu.models import init_network_variables
    from zero_tig_tpu.models.raft.raft import init_raft_variables

    net_vars = init_network_variables(jax.random.PRNGKey(21))
    raft_vars = init_raft_variables(jax.random.PRNGKey(22))
    return net_vars, raft_vars


def test_network_train_forward_and_loss_composed(tmp_path):
    """Reference Network.forward/_loss == forward_train + zero_tig_loss over a
    4-frame sequence with a mid-sequence reset (new, cont, NEW, cont)."""
    import jax
    import jax.numpy as jnp

    from model.model import Network
    from zero_tig_tpu.core.checkpoint import export_torch_state_dict
    from zero_tig_tpu.losses.zero_tig_loss import zero_tig_loss
    from zero_tig_tpu.models.network import forward_train

    net_vars, raft_vars = _variables()
    sd = {
        k: torch.as_tensor(np.array(v))
        for k, v in export_torch_state_dict(net_vars, raft_vars).items()
    }

    ref = Network(_args())
    # train.py:87-92 filtered partial load
    model_dict = ref.state_dict()
    model_dict.update({k: v for k, v in sd.items() if k in model_dict})
    ref.load_state_dict(model_dict)
    ref.train()

    fwd = jax.jit(
        lambda v, rv, f, c, new: forward_train(
            v, rv, f, c, new, of_scale=1, raft_iters=12, bn_train=True
        )
    )

    frames = _frames(4)
    flags = [True, False, True, False]

    variables = net_vars
    carry = {
        "last_H3": jnp.zeros((1, 128, 128, 3), jnp.float32),
        "last_s3": jnp.zeros((1, 128, 128, 3), jnp.float32),
    }
    for i, (frame, new) in enumerate(zip(frames, flags)):
        ref.is_new_seq = new
        ref_loss = ref._loss(_nchw(frame))
        ref_H3 = _nhwc(ref.last_H3)
        ref_s3 = _nhwc(ref.last_s3)

        outputs, new_stats, carry = fwd(
            variables, raft_vars, jnp.asarray(frame), carry, jnp.asarray(new)
        )
        variables = {"params": variables["params"], "batch_stats": new_stats}
        ours_loss = float(zero_tig_loss(jnp.asarray(frame), outputs))

        np.testing.assert_allclose(
            np.asarray(carry["last_H3"]), ref_H3, atol=2e-3, rtol=1e-3,
            err_msg=f"H3 frame {i} (new={new})",
        )
        np.testing.assert_allclose(
            np.asarray(carry["last_s3"]), ref_s3, atol=2e-3, rtol=1e-3,
            err_msg=f"s3 frame {i} (new={new})",
        )
        assert float(ref_loss) == pytest.approx(ours_loss, rel=2e-3), (
            i, float(ref_loss), ours_loss,
        )

    # BN running-stats trajectory parity after 4 train-mode forwards
    # (the shared block updates stats 3x per forward, model/model.py:60-67)
    ref_sd = ref.state_dict()
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["enhance"]["block"]["bn"]["mean"]),
        ref_sd["enhance.conv.1.running_mean"].numpy(),
        atol=1e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["enhance"]["block"]["bn"]["var"]),
        ref_sd["enhance.conv.1.running_var"].numpy(),
        atol=1e-4, rtol=1e-3,
    )


def test_train_trajectory_oracle():
    """Gradient + optimizer trajectory parity: N=3 reference torch training
    steps (``loss.backward() -> clip_grad_norm_(5) -> Adam(1e-4, wd 3e-4)``,
    train.py:128-131) vs N ``train_step`` calls from the same converted
    weights. Certifies d(loss)/d(params) and the optax chain (clip FIRST,
    then L2-in-grad weight decay, then Adam with bias correction --
    pipeline/steps.py:37-45) at the per-parameter-update level, not just by
    reading the chain. RAFT params are frozen in the reference
    (model/model.py:114 requires_grad=False -> grad None -> skipped by both
    clip and Adam), matching our separate untrained raft_vars."""
    import jax
    import jax.numpy as jnp

    from model.model import Network
    from zero_tig_tpu.core.checkpoint import export_torch_state_dict
    from zero_tig_tpu.core.config import Config
    from zero_tig_tpu.losses.zero_tig_loss import zero_tig_loss
    from zero_tig_tpu.models.network import forward_train
    from zero_tig_tpu.pipeline.steps import init_train_state, train_step

    net_vars, raft_vars = _variables()
    sd0 = {
        k: torch.as_tensor(np.array(v, copy=True))
        for k, v in export_torch_state_dict(net_vars, raft_vars).items()
    }

    ref = Network(_args())
    model_dict = ref.state_dict()
    model_dict.update({k: v for k, v in sd0.items() if k in model_dict})
    ref.load_state_dict(model_dict)
    ref.train()
    # train.py:98 -- torch Adam is L2-in-grad (NOT AdamW)
    opt = torch.optim.Adam(
        ref.parameters(), lr=1e-4, betas=(0.9, 0.999), weight_decay=3e-4
    )

    cfg = Config(of_scale=1, raft_iters=12)
    state = init_train_state(cfg, net_vars, (1, 128, 128, 3))

    @jax.jit
    def grads_of(params, batch_stats, carry, frame, new):
        def loss_fn(p):
            variables = {"params": p, "batch_stats": batch_stats}
            outputs, _, _ = forward_train(
                variables, raft_vars, frame, carry, new,
                of_scale=1, raft_iters=12, bn_train=True,
            )
            return zero_tig_loss(frame, outputs, is_wb=False)

        return jax.grad(loss_fn)(params)

    frames = _frames(3)
    flags = [True, False, False]
    for i, (frame, new) in enumerate(zip(frames, flags)):
        ref.is_new_seq = new
        ref_loss = ref._loss(_nchw(frame))
        opt.zero_grad()
        ref_loss.backward()

        # d(loss)/d(params) parity, BEFORE clip (torch's clip_grad_norm_
        # mutates p.grad in place). Only step 0 evaluates both frameworks at
        # IDENTICAL parameter points: from step 1 on, the parameter clouds
        # legitimately differ by the +-lr Adam sign-noise updates (see the
        # trajectory comment below) and gradients are chaos-amplified, so
        # tight elementwise gradient parity is only well-defined here.
        # Tolerance is scaled to each tensor's gradient magnitude: f32
        # reduction-order noise is relative to scale.
        if i == 0:
            g_ours = export_torch_state_dict(
                {"params": grads_of(state.params, state.batch_stats,
                                    state.carry, jnp.asarray(frame),
                                    jnp.asarray(new)),
                 "batch_stats": state.batch_stats},
                raft_vars,
            )
            g_checked = 0
            for k, p in ref.named_parameters():
                if p.grad is None or k not in g_ours:
                    continue
                g_ref = p.grad.detach().numpy()
                if k == "enhance.conv.0.bias":
                    # The shared block's conv bias feeds train-mode
                    # BatchNorm: the per-channel mean subtraction cancels a
                    # constant shift EXACTLY, so d(loss)/d(bias) is
                    # analytically zero and both frameworks produce only f32
                    # cancellation noise here.
                    assert np.abs(g_ref).max() < 1e-2
                    assert np.abs(np.asarray(g_ours[k])).max() < 1e-2
                    continue
                scale = max(np.abs(g_ref).max(), 1e-12)
                np.testing.assert_allclose(
                    np.asarray(g_ours[k], dtype=np.float32), g_ref,
                    rtol=2e-3, atol=3e-4 * scale,
                    err_msg=f"step {i} gradient mismatch for {k}",
                )
                g_checked += 1
            assert g_checked >= 10

        torch.nn.utils.clip_grad_norm_(ref.parameters(), 5)
        opt.step()

        state, loss = train_step(
            state, raft_vars, jnp.asarray(frame), jnp.asarray(new),
            of_scale=1, raft_iters=12, bn_train=True,
        )
        assert float(ref_loss.detach()) == pytest.approx(float(loss), rel=2e-3), (
            i, float(ref_loss.detach()), float(loss),
        )

    # Per-parameter update trajectory after 3 steps. Adam's update is
    # sign-like (m_hat/sqrt(v_hat) ~ +-1 regardless of |g|), so elements
    # whose per-step gradients alternate sign sit on a knife edge where f32
    # reduction-order noise flips the whole +-lr step -- those cannot match
    # bit-tightly in ANY faithful reimplementation. The certificate is:
    # >=99.5% of elements within 6e-6 (2% of the 3-step budget), and every
    # element within the worst-case Adam excursion (~1.1*lr per step each
    # side). The per-step gradient check above carries the tight parity.
    ours_sd = export_torch_state_dict(
        {"params": state.params, "batch_stats": state.batch_stats}, raft_vars
    )
    ref_sd = ref.state_dict()
    checked = 0
    n_bad = n_all = 0
    for k, v0 in sd0.items():
        if (
            k.startswith("raft.")
            or "running_" in k
            or "num_batches" in k
            or k not in ref_sd
            or k not in ours_sd
        ):
            continue
        d_ref = ref_sd[k].detach().numpy() - v0.numpy()
        d_ours = np.asarray(ours_sd[k], dtype=np.float32) - v0.numpy()
        assert np.abs(d_ref).max() > 0, f"{k}: reference param never moved"
        diff = np.abs(d_ours - d_ref)
        assert diff.max() <= 2 * 1.1 * 1e-4 * 3, (
            f"update excursion beyond the Adam bound for {k}: {diff.max():.2e}"
        )
        if k != "enhance.conv.0.bias":  # zero-grad tensor: noise-only steps
            n_bad += int((diff > 6e-6).sum())
            n_all += diff.size
        checked += 1
    assert checked >= 10  # all enhance/denoise conv + BN tensors
    assert n_bad / n_all < 0.005, (
        f"3-step Adam update mismatch: {n_bad}/{n_all} elements off by >6e-6"
    )


def test_finetunemodel_inference_composed(tmp_path):
    """Reference Finetunemodel.forward == forward_inference over a 3-frame
    sequence (new, cont, cont) via the saved .pt round trip."""
    import jax
    import jax.numpy as jnp

    from model.model import Finetunemodel
    from zero_tig_tpu.core.checkpoint import save_torch_pt
    from zero_tig_tpu.models.network import forward_inference

    net_vars, raft_vars = _variables()
    ckpt = str(tmp_path / "combined.pt")
    save_torch_pt(ckpt, net_vars, raft_vars)

    ref = Finetunemodel(_args(model_pretrain=ckpt))
    # Reference bug (model/model.py:272-286): raft.* keys are dropped because
    # load_state_dict runs before self.raft exists. Our framework loads RAFT
    # weights explicitly (PARITY.md); mirror that fix here so both sides run
    # the same flow network.
    raft_sd = {
        k[len("raft.") :]: v
        for k, v in torch.load(ckpt).items()
        if k.startswith("raft.")
    }
    missing, unexpected = ref.raft.load_state_dict(raft_sd, strict=False)
    assert not unexpected
    ref.eval()

    fwd = jax.jit(
        lambda v, rv, f, c, new: forward_inference(
            v, rv, f, c, new, of_scale=1, raft_iters=12
        )
    )

    frames = _frames(3)
    flags = [True, False, False]
    carry = {
        "last_H3": jnp.zeros((1, 128, 128, 3), jnp.float32),
        "last_s3": jnp.zeros((1, 128, 128, 3), jnp.float32),
    }
    for i, (frame, new) in enumerate(zip(frames, flags)):
        ref.is_new_seq = new
        with torch.no_grad():
            rH2, rH3, rs3 = ref(_nchw(frame))

        (H2, H3, s3), carry = fwd(
            net_vars, raft_vars, jnp.asarray(frame), carry, jnp.asarray(new)
        )
        np.testing.assert_allclose(
            np.asarray(H2), _nhwc(rH2), atol=2e-3, rtol=1e-3,
            err_msg=f"H2 frame {i}",
        )
        np.testing.assert_allclose(
            np.asarray(H3), _nhwc(rH3), atol=2e-3, rtol=1e-3,
            err_msg=f"H3 frame {i}",
        )
        np.testing.assert_allclose(
            np.asarray(s3), _nhwc(rs3), atol=2e-3, rtol=1e-3,
            err_msg=f"s3 frame {i}",
        )
