"""PyTorch CLIP / CLIP-ViP checkpoint <-> flax param-tree converter.

Covers the reference's checkpoint surface: OpenAI/HF CLIP weights loaded by
``VidCLIP`` (ref ``CLIP-ViP/src/modeling/VidCLIP.py:14-18``) and the released
``pretrain_clipvip_base_32.pt``-style state dicts (a ``VidCLIP`` state_dict
with a ``clipmodel.`` prefix), including the ViP extras ``added_cls`` and
``temporal_embedding``. The reference's own Swin 2D->3D inflator
(``LF-VILA/src/utils/load.py:94-240``) is the precedent for this kind of
cross-framework key mapping.

The converter is shape-tolerant the same way the reference's
``load_state_dict_with_mismatch`` is (``CLIP-ViP/src/utils/load_save.py:86-115``):
keys whose shapes disagree are skipped with a warning rather than fatal.
Temporal embeddings whose length differs from the target config are linearly
interpolated (the model also interpolates at runtime).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

from xpretrain_tpu.utils.logging import LOGGER

# torch Linear stores [out, in]; flax Dense kernel is [in, out]
_LINEAR = "linear"
# torch Conv2d stores [out, in, kh, kw]; flax Conv kernel is [kh, kw, in, out]
_CONV = "conv"
_DIRECT = "direct"


def _layer_rules(prefix_t: str, prefix_f: tuple[str, ...], n_layers: int):
    """Per-encoder-layer key mapping rules."""
    rules = {}
    for i in range(n_layers):
        t = f"{prefix_t}.encoder.layers.{i}"
        f = prefix_f + ("encoder", f"layers_{i}")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            rules[f"{t}.self_attn.{proj}.weight"] = (f + ("self_attn", proj, "kernel"), _LINEAR)
            rules[f"{t}.self_attn.{proj}.bias"] = (f + ("self_attn", proj, "bias"), _DIRECT)
        for fc in ("fc1", "fc2"):
            rules[f"{t}.mlp.{fc}.weight"] = (f + ("mlp", fc, "kernel"), _LINEAR)
            rules[f"{t}.mlp.{fc}.bias"] = (f + ("mlp", fc, "bias"), _DIRECT)
        for ln in ("layer_norm1", "layer_norm2"):
            rules[f"{t}.{ln}.weight"] = (f + (ln, "scale"), _DIRECT)
            rules[f"{t}.{ln}.bias"] = (f + (ln, "bias"), _DIRECT)
    return rules


def clip_key_rules(n_text_layers: int = 12, n_vision_layers: int = 12):
    """Full HF-CLIP(+ViP) -> flax key mapping."""
    rules: dict[str, tuple[tuple[str, ...], str]] = {
        "logit_scale": (("logit_scale",), _DIRECT),
        "text_projection.weight": (("text_projection", "kernel"), _LINEAR),
        "visual_projection.weight": (("visual_projection", "kernel"), _LINEAR),
        # text tower
        "text_model.embeddings.token_embedding.weight": (
            ("text_model", "embeddings", "token_embedding", "embedding"),
            _DIRECT,
        ),
        "text_model.embeddings.position_embedding.weight": (
            ("text_model", "embeddings", "position_embedding"),
            _DIRECT,
        ),
        "text_model.final_layer_norm.weight": (("text_model", "final_layer_norm", "scale"), _DIRECT),
        "text_model.final_layer_norm.bias": (("text_model", "final_layer_norm", "bias"), _DIRECT),
        # vision tower (note: HF spells it "pre_layrnorm")
        "vision_model.embeddings.class_embedding": (
            ("vision_model", "embeddings", "class_embedding"),
            _DIRECT,
        ),
        "vision_model.embeddings.patch_embedding.weight": (
            ("vision_model", "embeddings", "patch_embedding", "kernel"),
            _CONV,
        ),
        "vision_model.embeddings.position_embedding.weight": (
            ("vision_model", "embeddings", "position_embedding"),
            _DIRECT,
        ),
        "vision_model.pre_layrnorm.weight": (("vision_model", "pre_layernorm", "scale"), _DIRECT),
        "vision_model.pre_layrnorm.bias": (("vision_model", "pre_layernorm", "bias"), _DIRECT),
        "vision_model.post_layernorm.weight": (("vision_model", "post_layernorm", "scale"), _DIRECT),
        "vision_model.post_layernorm.bias": (("vision_model", "post_layernorm", "bias"), _DIRECT),
        # ViP extras
        "vision_model.embeddings.added_cls": (("vision_model", "embeddings", "added_cls"), _DIRECT),
        "vision_model.embeddings.temporal_embedding": (
            ("vision_model", "embeddings", "temporal_embedding"),
            _DIRECT,
        ),
    }
    rules.update(_layer_rules("text_model", ("text_model",), n_text_layers))
    rules.update(_layer_rules("vision_model", ("vision_model",), n_vision_layers))
    return rules


def _set_nested(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def _transform(value: np.ndarray, kind: str) -> np.ndarray:
    if kind == _LINEAR:
        return value.T
    if kind == _CONV:
        return value.transpose(2, 3, 1, 0)
    return value


_PREFIX_RE = re.compile(r"^(module\.)?(clipmodel\.)?")


def strip_prefixes(state_dict: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Strip DDP/VidCLIP wrappers and convert tensors to numpy."""
    out = {}
    for key, value in state_dict.items():
        key = _PREFIX_RE.sub("", key)
        if hasattr(value, "detach"):  # torch tensor without importing torch
            value = value.detach().cpu().float().numpy()
        out[key] = np.asarray(value)
    return out


def _interp_temporal(value: np.ndarray, target_len: int) -> np.ndarray:
    """Linear interpolation of [1, T, C] temporal embeddings to target_len
    (align_corners=False convention, matching runtime interpolation)."""
    src_len = value.shape[1]
    if src_len == target_len:
        return value
    x = (np.arange(target_len) + 0.5) * src_len / target_len - 0.5
    x = np.clip(x, 0, src_len - 1)
    lo = np.floor(x).astype(int)
    hi = np.minimum(lo + 1, src_len - 1)
    w = (x - lo)[None, :, None]
    return value[:, lo] * (1 - w) + value[:, hi] * w


def torch_clip_to_flax(
    state_dict: Mapping[str, Any],
    n_text_layers: int = 12,
    n_vision_layers: int = 12,
    temporal_size: int | None = None,
) -> dict:
    """Convert a (possibly prefixed) CLIP/CLIP-ViP state_dict to a flax tree.

    Returns the ``{"params": ...}`` variables dict for ``CLIPViPModel``.
    """
    sd = strip_prefixes(state_dict)
    rules = clip_key_rules(n_text_layers, n_vision_layers)
    params: dict = {}
    unused = []
    for key, value in sd.items():
        if key == "position_ids" or key.endswith(".position_ids"):
            continue
        if key not in rules:
            unused.append(key)
            continue
        path, kind = rules[key]
        value = _transform(value, kind)
        if path[-1] == "temporal_embedding" and temporal_size is not None:
            value = _interp_temporal(value, temporal_size)
        _set_nested(params, path, value)
    if unused:
        LOGGER.warning("converter: %d unmapped keys (first 5: %s)", len(unused), unused[:5])
    return {"params": params}


def flax_to_torch_clip(params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Inverse mapping (export): flax tree -> HF-CLIP-named numpy state dict."""
    tree = params.get("params", params)
    flat: dict[tuple[str, ...], np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            flat[path] = np.asarray(node)

    walk(tree, ())
    # invert via the rules table with a generous layer count
    rules = clip_key_rules(64, 64)
    inverse = {path: (torch_key, kind) for torch_key, (path, kind) in rules.items()}
    out = {}
    for path, value in flat.items():
        if path in inverse:
            torch_key, kind = inverse[path]
            if kind == _LINEAR:
                value = value.T
            elif kind == _CONV:
                value = value.transpose(3, 2, 0, 1)  # [kh,kw,in,out] -> [out,in,kh,kw]
            out[torch_key] = value
        else:
            LOGGER.warning("export: no rule for %s", "/".join(path))
    return out


def merge_pretrained(params: dict, pretrained: dict) -> dict:
    """Shape-tolerant merge of converted pretrained params into a fresh init.

    Equivalent to ``load_state_dict_with_mismatch``: matching keys with
    matching shapes are replaced; mismatches keep the fresh init.
    """

    def merge(dst, src, path=""):
        for key, value in src.items():
            if key not in dst:
                LOGGER.warning("merge: unexpected key %s%s", path, key)
                continue
            if isinstance(value, Mapping):
                merge(dst[key], value, f"{path}{key}/")
            else:
                if np.shape(dst[key]) != np.shape(value):
                    LOGGER.warning(
                        "merge: shape mismatch at %s%s: %s vs %s — keeping init",
                        path,
                        key,
                        np.shape(dst[key]),
                        np.shape(value),
                    )
                    continue
                dst[key] = np.asarray(value, dtype=np.float32)
        return dst

    import copy

    merged = copy.deepcopy(jax_tree_to_dict(params))
    merge(merged["params"], pretrained.get("params", pretrained))
    return merged


def jax_tree_to_dict(tree) -> dict:
    """Recursively convert FrozenDict / flax structures to plain dicts."""
    if isinstance(tree, Mapping):
        return {k: jax_tree_to_dict(v) for k, v in tree.items()}
    return tree


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a .pt/.bin/.safetensors checkpoint into numpy (torch optional)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and all(
        hasattr(v, "detach") for v in sd["model"].values()
    ):
        sd = sd["model"]
    return strip_prefixes(sd)
