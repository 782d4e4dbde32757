"""HD-VILA checkpoint converters (torch -> flax).

Covers the ResNet (torchvision/mmdet layout, ref
``resnet_mmdetection.py``), the feature-level TimeSformer
(``timesformer.py``), and the grid-encoder convs of the hybrid model
(``e2e_model.py:36-47``).
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np

from xpretrain_tpu.utils.logging import LOGGER


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().float().numpy()
    return np.asarray(v)


def _set(tree: dict, path: tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_BN_MAP = {"weight": "scale", "bias": "bias", "running_mean": "mean", "running_var": "var"}


def resnet_torch_to_flax(state_dict: Mapping) -> dict:
    """torchvision/mmdet ResNet state_dict -> our flax tree."""
    params: dict = {}
    unused = []
    for key, value in state_dict.items():
        v = _np(value)
        if key == "conv1.weight":
            _set(params, ("conv1", "kernel"), v.transpose(2, 3, 1, 0))
        elif m := re.match(r"bn1\.(\w+)$", key):
            if m.group(1) in _BN_MAP:
                _set(params, ("bn1", _BN_MAP[m.group(1)]), v)
        elif m := re.match(r"layer(\d)\.(\d+)\.conv(\d)\.weight", key):
            s, b, c = m.groups()
            _set(params, (f"layer{s}_{b}", f"conv{c}", "kernel"), v.transpose(2, 3, 1, 0))
        elif m := re.match(r"layer(\d)\.(\d+)\.bn(\d)\.(\w+)", key):
            s, b, c, w = m.groups()
            if w in _BN_MAP:
                _set(params, (f"layer{s}_{b}", f"bn{c}", _BN_MAP[w]), v)
        elif m := re.match(r"layer(\d)\.(\d+)\.downsample\.0\.weight", key):
            s, b = m.groups()
            _set(params, (f"layer{s}_{b}", "downsample_conv", "kernel"), v.transpose(2, 3, 1, 0))
        elif m := re.match(r"layer(\d)\.(\d+)\.downsample\.1\.(\w+)", key):
            s, b, w = m.groups()
            if w in _BN_MAP:
                _set(params, (f"layer{s}_{b}", "downsample_bn", _BN_MAP[w]), v)
        elif "num_batches_tracked" in key or key.startswith("fc."):
            continue
        else:
            unused.append(key)
    if unused:
        LOGGER.warning("resnet converter: %d unmapped keys (first 5: %s)", len(unused), unused[:5])
    return params


def timesformer_torch_to_flax(state_dict: Mapping) -> dict:
    """Reference TimeSformer state_dict -> our flax tree."""
    params: dict = {}
    unused = []
    for key, value in state_dict.items():
        v = _np(value)
        if key in ("pos_embed", "time_embed"):
            _set(params, (key,), v)
        elif re.match(r"norm\.(weight|bias)", key):
            continue  # dead param: the reference never applies its final norm
        elif m := re.match(r"blocks\.(\d+)\.(.+)", key):
            i, rest = m.groups()
            base = (f"blocks_{i}",)
            table = {
                "norm1.weight": ("norm1", "scale"),
                "norm1.bias": ("norm1", "bias"),
                "norm2.weight": ("norm2", "scale"),
                "norm2.bias": ("norm2", "bias"),
                "temporal_norm1.weight": ("temporal_norm1", "scale"),
                "temporal_norm1.bias": ("temporal_norm1", "bias"),
                "attn.qkv.weight": ("attn", "qkv", "kernel"),
                "attn.qkv.bias": ("attn", "qkv", "bias"),
                "attn.proj.weight": ("attn", "proj", "kernel"),
                "attn.proj.bias": ("attn", "proj", "bias"),
                "temporal_attn.qkv.weight": ("temporal_attn", "qkv", "kernel"),
                "temporal_attn.qkv.bias": ("temporal_attn", "qkv", "bias"),
                "temporal_attn.proj.weight": ("temporal_attn", "proj", "kernel"),
                "temporal_attn.proj.bias": ("temporal_attn", "proj", "bias"),
                "temporal_fc.weight": ("temporal_fc", "kernel"),
                "temporal_fc.bias": ("temporal_fc", "bias"),
                "mlp.fc1.weight": ("mlp_fc1", "kernel"),
                "mlp.fc1.bias": ("mlp_fc1", "bias"),
                "mlp.fc2.weight": ("mlp_fc2", "kernel"),
                "mlp.fc2.bias": ("mlp_fc2", "bias"),
            }
            if rest not in table:
                unused.append(key)
                continue
            if rest.endswith("weight") and "norm" not in rest:
                v = v.T
            _set(params, base + table[rest], v)
        else:
            unused.append(key)
    if unused:
        LOGGER.warning("timesformer converter: %d unmapped (first 5: %s)", len(unused), unused[:5])
    return params
