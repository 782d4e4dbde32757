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


def hdvila_e2e_torch_to_flax(state_dict: Mapping) -> dict:
    """Full HDVILA e2e checkpoint -> {encoder:…, transformer:…} flax trees.

    Routes the reference module prefixes (``e2e_model.py:34-47,63``):
    ``cnn.* / cnn_low.*`` -> ResNets, ``grid_encoder*.0.*`` -> the 1×1 convs,
    ``timesformer.*`` -> TimeSformer, ``transformer.*`` -> the two-stage BERT
    + heads (via the shared BERT converter).
    """
    from xpretrain_tpu.models.bert_convert import bert_torch_to_flax

    groups: dict[str, dict] = {}
    for key, value in state_dict.items():
        prefix, _, rest = key.partition(".")
        groups.setdefault(prefix, {})[rest] = value

    encoder: dict = {}
    if "cnn" in groups:
        encoder["cnn"] = resnet_torch_to_flax(groups["cnn"])
    if "cnn_low" in groups:
        encoder["cnn_low"] = resnet_torch_to_flax(groups["cnn_low"])
    for tname, fname in (
        ("grid_encoder", "grid_encoder_conv"),
        ("grid_encoder_low", "grid_encoder_low_conv"),
        ("grid_encoder_combine", "grid_encoder_combine_conv"),
    ):
        if tname in groups and "0.weight" in groups[tname]:
            encoder[fname] = {"kernel": _np(groups[tname]["0.weight"]).transpose(2, 3, 1, 0)}
    if "timesformer" in groups:
        encoder["timesformer"] = timesformer_torch_to_flax(groups["timesformer"])

    transformer: dict = {}
    if "transformer" in groups:
        t = groups["transformer"]
        bert_sd = {k: v for k, v in t.items() if k.startswith("bert.") and not k.startswith(
            ("bert.pooler1", "bert.pooler2", "bert.visual_embeddings"))}
        bert_tree, _pooler, _ = bert_torch_to_flax(bert_sd, prefix="bert.")
        base: dict = {"bert": bert_tree}
        for pooler_name in ("pooler1", "pooler2"):
            wkey, bkey = f"bert.{pooler_name}.dense.weight", f"bert.{pooler_name}.dense.bias"
            if wkey in t:
                base[pooler_name] = {"dense": {"kernel": _np(t[wkey]).T, "bias": _np(t[bkey])}}
        vis: dict = {}
        for emb in ("row_position_embeddings", "col_position_embeddings"):
            k = f"bert.visual_embeddings.{emb}.weight"
            if k in t:
                vis[emb] = {"embedding": _np(t[k])}
        if "bert.visual_embeddings.token_type_embeddings.weight" in t:
            vis["token_type_embedding"] = _np(
                t["bert.visual_embeddings.token_type_embeddings.weight"]
            ).reshape(1, 1, -1)
        if "bert.visual_embeddings.LayerNorm.weight" in t:
            vis["LayerNorm"] = {
                "scale": _np(t["bert.visual_embeddings.LayerNorm.weight"]),
                "bias": _np(t["bert.visual_embeddings.LayerNorm.bias"]),
            }
        if vis:
            base["visual_embeddings"] = vis
        transformer["bert_model"] = base
        _, _, mlm = bert_torch_to_flax(
            {k: v for k, v in t.items() if k.startswith("cls.")}, prefix=""
        )
        if mlm:
            transformer["cls"] = mlm
        for proj in ("t_proj", "v_proj"):
            if f"{proj}.weight" in t:
                transformer[proj] = {
                    "kernel": _np(t[f"{proj}.weight"]).T,
                    "bias": _np(t[f"{proj}.bias"]),
                }
        if "cls.seq_relationship.weight" in t:
            transformer["seq_relationship"] = {
                "kernel": _np(t["cls.seq_relationship.weight"]).T,
                "bias": _np(t["cls.seq_relationship.bias"]),
            }
    return {"encoder": encoder, "transformer": transformer}


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
