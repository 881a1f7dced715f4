"""Checkpoint I/O: PyTorch state-dict <-> JAX pytree conversion + native save.

The reference ships combined ``torch.save(model.state_dict())`` checkpoints
(weights/BVI-RLV.pt, weights/BVI-Coral.pt) plus a standalone
``raft-sintel.pth`` wrapped in DataParallel ('module.' prefix, demo.py:69-71).
This module converts both directions with exact key parity, including:

  * NCHW->NHWC / OIHW->HWIO weight transposes,
  * the shared-conv Enhancer layout: the torch state dict contains
    enhance.conv.* AND three aliased copies enhance.blocks.{0,1,2}.*
    (model/model.py:60-67); import reads enhance.conv.*, export re-emits all
    four aliases so the reference loader accepts our checkpoints,
  * BatchNorm weight/bias/running_mean/running_var ->
    scale/bias + batch_stats {mean, var},
  * the Finetunemodel RAFT-weights quirk (SURVEY.md section 2.2): the
    reference *silently drops* raft.* keys at inference; we load them
    explicitly and deliberately (``load_raft`` flag).

Native checkpoints are flax-serialization msgpack files (``.msgpack``).
torch is only needed for .pt interchange and is imported lazily.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np
from flax import serialization

# ----------------------------------------------------------------- key maps

_NET_CONV_RE = [
    # (torch regex, our path template). {p} = weight/bias name slot.
    (re.compile(r"^enhance\.in_conv\.0\.(weight|bias)$"), ("enhance", "in_conv")),
    (re.compile(r"^enhance\.conv\.0\.(weight|bias)$"), ("enhance", "block", "conv")),
    (re.compile(r"^enhance\.out_conv\.0\.(weight|bias)$"), ("enhance", "out_conv")),
    (re.compile(r"^denoise_1\.(conv[123])\.(weight|bias)$"), ("denoise_1",)),
    (re.compile(r"^denoise_2\.(conv[123])\.(weight|bias)$"), ("denoise_2",)),
]


def _torch_to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy())


def _conv_w(arr: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.ascontiguousarray(arr.transpose(2, 3, 1, 0))


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _raft_key_to_path(key: str) -> tuple[str, tuple[str, ...], str] | None:
    """Map a torch RAFT key (without the 'raft.' prefix) to
    (collection, path, kind). kind in {conv_w, vec}. Returns None to skip."""
    if key.endswith("num_batches_tracked"):
        return None
    parts = key.split(".")
    net = parts[0]  # fnet | cnet | update_block
    leaf = parts[-1]

    def bn_leaf(name):
        return {
            "weight": ("params", "scale"),
            "bias": ("params", "bias"),
            "running_mean": ("batch_stats", "mean"),
            "running_var": ("batch_stats", "var"),
        }[name]

    if net in ("fnet", "cnet"):
        body = parts[1:-1]
        if body == ["conv1"] or body == ["conv2"]:
            kind = "conv_w" if leaf == "weight" else "vec"
            name = "kernel" if leaf == "weight" else "bias"
            return "params", (net, body[0], name), kind
        if body == ["norm1"]:
            if net == "fnet":
                return None  # InstanceNorm: parameter-free
            col, name = bn_leaf(leaf)
            return col, (net, "norm1", "bn", name), "vec"
        if body[0].startswith("layer"):
            layer = f"{body[0]}_{body[1]}"
            rest = body[2:]
            if rest[0] in ("conv1", "conv2"):
                name = "kernel" if leaf == "weight" else "bias"
                kind = "conv_w" if leaf == "weight" else "vec"
                return "params", (net, layer, rest[0], name), kind
            if rest[0] in ("norm1", "norm2", "norm3"):
                if net == "fnet":
                    return None
                col, name = bn_leaf(leaf)
                return col, (net, layer, rest[0], "bn", name), "vec"
            if rest[0] == "downsample":
                if rest[1] == "0":  # 1x1 conv
                    name = "kernel" if leaf == "weight" else "bias"
                    kind = "conv_w" if leaf == "weight" else "vec"
                    return "params", (net, layer, "downsample", name), kind
                # downsample.1 = norm3
                if net == "fnet":
                    return None
                col, name = bn_leaf(leaf)
                return col, (net, layer, "norm3", "bn", name), "vec"
        raise KeyError(f"unrecognized RAFT encoder key: {key}")

    if net == "update_block":
        body = parts[1:-1]
        name = "kernel" if leaf == "weight" else "bias"
        kind = "conv_w" if leaf == "weight" else "vec"
        if body[0] == "mask":
            return "params", (net, f"mask_{body[1]}", name), kind
        return "params", (net, *body, name), kind

    raise KeyError(f"unrecognized RAFT key: {key}")


# --------------------------------------------------------------- public API


def convert_torch_state_dict(
    state_dict: dict[str, Any],
) -> tuple[dict | None, dict | None]:
    """Convert a reference state dict to (net_variables, raft_variables).

    Accepts the combined Network/Finetunemodel checkpoint, a RAFT-only
    checkpoint (keys like 'fnet....' with optional 'module.' DataParallel
    prefix), or any partial subset (key-intersection semantics, like the
    reference loaders at train.py:87-92). Returns None for an absent half.
    """
    net_params: dict = {}
    net_stats: dict = {}
    raft_params: dict = {}
    raft_stats: dict = {}

    for key, value in state_dict.items():
        arr = _torch_to_np(value) if hasattr(value, "detach") else np.asarray(value)
        k = key
        if k.startswith("module."):
            k = k[len("module.") :]

        if k.startswith("enhance.blocks."):
            continue  # aliases of enhance.conv.* (shared module)
        if k == "enhance.conv.1.weight":
            _set(net_params, ("enhance", "block", "bn", "scale"), arr)
            continue
        if k == "enhance.conv.1.bias":
            _set(net_params, ("enhance", "block", "bn", "bias"), arr)
            continue
        if k == "enhance.conv.1.running_mean":
            _set(net_stats, ("enhance", "block", "bn", "mean"), arr)
            continue
        if k == "enhance.conv.1.running_var":
            _set(net_stats, ("enhance", "block", "bn", "var"), arr)
            continue
        if k.endswith("num_batches_tracked") and not k.startswith("raft."):
            continue

        matched = False
        for regex, prefix in _NET_CONV_RE:
            m = regex.match(k)
            if m:
                groups = m.groups()
                leaf = groups[-1]
                sub = groups[:-1]
                name = "kernel" if leaf == "weight" else "bias"
                arr2 = _conv_w(arr) if leaf == "weight" else arr
                _set(net_params, (*prefix, *sub, name), arr2)
                matched = True
                break
        if matched:
            continue

        raft_key = k[len("raft.") :] if k.startswith("raft.") else k
        try:
            mapped = _raft_key_to_path(raft_key)
        except KeyError:
            continue  # unknown key: intersection semantics
        if mapped is None:
            continue
        col, path, kind = mapped
        arr2 = _conv_w(arr) if kind == "conv_w" else arr
        if col == "params":
            _set(raft_params, path, arr2)
        else:
            _set(raft_stats, path, arr2)

    net_vars = None
    if net_params:
        net_vars = {"params": net_params, "batch_stats": net_stats}
    raft_vars = None
    if raft_params:
        raft_vars = {"params": raft_params, "batch_stats": raft_stats}
    return net_vars, raft_vars


def load_torch_checkpoint(path: str) -> tuple[dict | None, dict | None]:
    """Load a .pt/.pth reference checkpoint (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torch_state_dict(sd)


def export_torch_state_dict(net_vars: dict, raft_vars: dict | None = None) -> dict:
    """Build a reference-compatible numpy state dict (NCHW/OIHW keys).

    Includes the enhance.blocks.{0,1,2} aliases so reference ``load_state_dict``
    accepts it. Values are numpy arrays; wrap with torch.as_tensor to save.
    """
    out: dict[str, np.ndarray] = {}

    def conv_back(a):
        return np.ascontiguousarray(np.asarray(a).transpose(3, 2, 0, 1))

    p = net_vars["params"]
    s = net_vars.get("batch_stats", {})
    out["enhance.in_conv.0.weight"] = conv_back(p["enhance"]["in_conv"]["kernel"])
    out["enhance.in_conv.0.bias"] = np.asarray(p["enhance"]["in_conv"]["bias"])
    conv_w = conv_back(p["enhance"]["block"]["conv"]["kernel"])
    conv_b = np.asarray(p["enhance"]["block"]["conv"]["bias"])
    bn_w = np.asarray(p["enhance"]["block"]["bn"]["scale"])
    bn_b = np.asarray(p["enhance"]["block"]["bn"]["bias"])
    bn_m = np.asarray(s["enhance"]["block"]["bn"]["mean"])
    bn_v = np.asarray(s["enhance"]["block"]["bn"]["var"])
    for alias in ["conv"] + [f"blocks.{i}" for i in range(3)]:
        out[f"enhance.{alias}.0.weight"] = conv_w
        out[f"enhance.{alias}.0.bias"] = conv_b
        out[f"enhance.{alias}.1.weight"] = bn_w
        out[f"enhance.{alias}.1.bias"] = bn_b
        out[f"enhance.{alias}.1.running_mean"] = bn_m
        out[f"enhance.{alias}.1.running_var"] = bn_v
        out[f"enhance.{alias}.1.num_batches_tracked"] = np.asarray(0)
    out["enhance.out_conv.0.weight"] = conv_back(p["enhance"]["out_conv"]["kernel"])
    out["enhance.out_conv.0.bias"] = np.asarray(p["enhance"]["out_conv"]["bias"])
    for dn in ("denoise_1", "denoise_2"):
        for cv in ("conv1", "conv2", "conv3"):
            out[f"{dn}.{cv}.weight"] = conv_back(p[dn][cv]["kernel"])
            out[f"{dn}.{cv}.bias"] = np.asarray(p[dn][cv]["bias"])

    if raft_vars is not None:
        _export_raft(out, raft_vars)
    return out


def _export_raft(out: dict, raft_vars: dict) -> None:
    def conv_back(a):
        return np.ascontiguousarray(np.asarray(a).transpose(3, 2, 0, 1))

    def walk(tree, torch_prefix, our_path, collection):
        for name, sub in tree.items():
            if isinstance(sub, dict):
                walk(sub, torch_prefix, (*our_path, name), collection)
            else:
                key = _our_raft_path_to_torch((*our_path, name), collection)
                if key is None:
                    continue
                arr = np.asarray(sub)
                if key.endswith("weight") and arr.ndim == 4:
                    arr = conv_back(arr)
                out["raft." + key] = arr
                # torch registers strided-block norm3 twice: as .norm3 AND as
                # .downsample.1 (extractor.py:25,43-44) -- emit both aliases
                # so reference strict loading sees every key
                if ".downsample.1." in key:
                    out["raft." + key.replace(".downsample.1.", ".norm3.")] = arr

    walk(raft_vars["params"], "raft.", (), "params")
    walk(raft_vars.get("batch_stats", {}), "raft.", (), "batch_stats")


def _our_raft_path_to_torch(path: tuple[str, ...], collection: str) -> str | None:
    parts = list(path)
    leaf = parts.pop()
    leaf_map_params = {"kernel": "weight", "bias": "bias", "scale": "weight"}
    leaf_map_stats = {"mean": "running_mean", "var": "running_var"}
    leaf_t = (leaf_map_params if collection == "params" else leaf_map_stats)[leaf]

    segs = []
    for p in parts:
        if p == "bn":
            continue
        m = re.match(r"^layer(\d)_(\d)$", p)
        if m:
            segs.append(f"layer{m.group(1)}.{m.group(2)}")
        elif p == "downsample":
            segs.append("downsample.0")
        elif p == "norm3" and segs and segs[-1].startswith("layer"):
            # norm3 lives inside the downsample Sequential in torch
            segs.append("downsample.1")
        elif re.match(r"^mask_(\d)$", p):
            segs.append("mask." + p.split("_")[1])
        else:
            segs.append(p)
    return ".".join(segs) + "." + leaf_t


# ------------------------------------------------------------- native format


def save_msgpack(path: str, tree: Any) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def load_msgpack(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_torch_pt(path: str, net_vars: dict, raft_vars: dict | None = None) -> None:
    """Save a reference-loadable .pt file (requires torch)."""
    import torch

    sd = export_torch_state_dict(net_vars, raft_vars)
    torch.save(
        {k: torch.as_tensor(np.array(v, copy=True)) for k, v in sd.items()},
        path,
    )
