"""Flax -> torch state-dict export for the HD-VILA and LF-VILA families.

The inverse of the per-family ``*_torch_to_flax`` converters, producing
reference-keyed numpy state dicts (``hd-vila/src/modeling/e2e_model.py``
module layout, ``LF-VILA/src/models/lfvila_pretrain.py:51-78`` layout) so
trained flax checkpoints can be compared against or loaded into the torch
ecosystem (the interop direction round 1 only shipped for CLIP-ViP,
``clip_vip/convert.py:flax_to_torch_clip``). CLIP-ViP's exporter lives in
its own converter module.

All outputs are plain numpy; callers tensorize with
``{k: torch.from_numpy(v) for k, v in sd.items()}``.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _flatten(tree: Mapping, prefix: tuple[str, ...] = ()):
    for key, value in tree.items():
        path = prefix + (str(key),)
        if isinstance(value, Mapping):
            yield from _flatten(value, path)
        else:
            yield path, np.asarray(value)


def _conv_back(v: np.ndarray) -> np.ndarray:
    """flax conv kernel -> torch layout ([*k, I, O] -> [O, I, *k])."""
    nd = v.ndim
    return v.transpose((nd - 1, nd - 2) + tuple(range(nd - 2)))


# ---------------------------------------------------------------------------
# BERT (inverse of bert_convert.bert_torch_to_flax)
# ---------------------------------------------------------------------------

_EMB_BACK = {
    ("word_embeddings", "embedding"): "embeddings.word_embeddings.weight",
    ("position_embeddings", "embedding"): "embeddings.position_embeddings.weight",
    ("token_type_embeddings", "embedding"): "embeddings.token_type_embeddings.weight",
    ("LayerNorm", "scale"): "embeddings.LayerNorm.weight",
    ("LayerNorm", "bias"): "embeddings.LayerNorm.bias",
}

_LAYER_BACK = {
    ("attention_self", "query", "kernel"): ("attention.self.query.weight", True),
    ("attention_self", "query", "bias"): ("attention.self.query.bias", False),
    ("attention_self", "key", "kernel"): ("attention.self.key.weight", True),
    ("attention_self", "key", "bias"): ("attention.self.key.bias", False),
    ("attention_self", "value", "kernel"): ("attention.self.value.weight", True),
    ("attention_self", "value", "bias"): ("attention.self.value.bias", False),
    ("attention_output_dense", "kernel"): ("attention.output.dense.weight", True),
    ("attention_output_dense", "bias"): ("attention.output.dense.bias", False),
    ("attention_output_LayerNorm", "scale"): ("attention.output.LayerNorm.weight", False),
    ("attention_output_LayerNorm", "bias"): ("attention.output.LayerNorm.bias", False),
    ("intermediate_dense", "kernel"): ("intermediate.dense.weight", True),
    ("intermediate_dense", "bias"): ("intermediate.dense.bias", False),
    ("output_dense", "kernel"): ("output.dense.weight", True),
    ("output_dense", "bias"): ("output.dense.bias", False),
    ("output_LayerNorm", "scale"): ("output.LayerNorm.weight", False),
    ("output_LayerNorm", "bias"): ("output.LayerNorm.bias", False),
}

_MLM_BACK = {
    ("transform_dense", "kernel"): ("transform.dense.weight", True),
    ("transform_dense", "bias"): ("transform.dense.bias", False),
    ("transform_LayerNorm", "scale"): ("transform.LayerNorm.weight", False),
    ("transform_LayerNorm", "bias"): ("transform.LayerNorm.bias", False),
    ("decoder", "kernel"): ("decoder.weight", True),
    ("decoder", "bias"): ("decoder.bias", False),
}


def bert_flax_to_torch(
    bert: Mapping,
    pooler: Mapping | None = None,
    mlm: Mapping | None = None,
    prefix: str = "bert.",
    mlm_prefix: str = "cls.predictions.",
) -> dict[str, np.ndarray]:
    """StagedBertModel (+pooler, +MLM head) trees -> HF-BERT-named dict."""
    out: dict[str, np.ndarray] = {}
    for path, v in _flatten(bert):
        if path[0] == "embeddings" and path[1:] in _EMB_BACK:
            out[prefix + _EMB_BACK[path[1:]]] = v
        elif path[0] == "encoder" and path[1].startswith("layer_"):
            i = path[1][len("layer_"):]
            rest = _LAYER_BACK.get(path[2:])
            if rest is None:
                continue
            key, transpose = rest
            out[f"{prefix}encoder.layer.{i}.{key}"] = v.T if transpose else v
        elif path[0] == "pooler":  # pooler stored inside the bert tree
            out[f"{prefix}pooler.dense." + ("weight" if path[-1] == "kernel" else "bias")] = (
                v.T if path[-1] == "kernel" else v
            )
    if pooler:
        for path, v in _flatten(pooler):
            out[f"{prefix}pooler.dense." + ("weight" if path[-1] == "kernel" else "bias")] = (
                v.T if path[-1] == "kernel" else v
            )
    if mlm:
        for path, v in _flatten(mlm):
            rest = _MLM_BACK.get(path)
            if rest is None:
                continue
            key, transpose = rest
            out[mlm_prefix + key] = v.T if transpose else v
            if path == ("decoder", "bias"):
                # HF BERT keeps a standalone tied copy at cls.predictions.bias
                out[mlm_prefix + "bias"] = v
    return out


# ---------------------------------------------------------------------------
# LF-VILA
# ---------------------------------------------------------------------------

_SWIN_BLOCK_BACK = {
    ("norm1", "scale"): ("norm1.weight", False),
    ("norm1", "bias"): ("norm1.bias", False),
    ("norm2", "scale"): ("norm2.weight", False),
    ("norm2", "bias"): ("norm2.bias", False),
    ("attn", "qkv", "kernel"): ("attn.qkv.weight", True),
    ("attn", "qkv", "bias"): ("attn.qkv.bias", False),
    ("attn", "proj", "kernel"): ("attn.proj.weight", True),
    ("attn", "proj", "bias"): ("attn.proj.bias", False),
    ("attn", "relative_position_bias_table"): ("attn.relative_position_bias_table", False),
    ("mlp_fc1", "kernel"): ("mlp.fc1.weight", True),
    ("mlp_fc1", "bias"): ("mlp.fc1.bias", False),
    ("mlp_fc2", "kernel"): ("mlp.fc2.weight", True),
    ("mlp_fc2", "bias"): ("mlp.fc2.bias", False),
}


def swin3d_flax_to_torch(params: Mapping) -> dict[str, np.ndarray]:
    """Inverse of ``lf_vila.convert.swin3d_torch_to_flax``."""
    out: dict[str, np.ndarray] = {}
    for path, v in _flatten(params):
        top = path[0]
        if top == "patch_embed":
            if path[1:] == ("proj", "kernel"):
                out["patch_embed.proj.weight"] = _conv_back(v)
            elif path[1:] == ("proj", "bias"):
                out["patch_embed.proj.bias"] = v
            elif path[1] == "norm":
                out["patch_embed.norm." + ("weight" if path[2] == "scale" else "bias")] = v
        elif top.startswith("layers_") and "_blocks_" in top:
            i, b = top[len("layers_"):].split("_blocks_")
            rest = _SWIN_BLOCK_BACK.get(path[1:])
            if rest is None:
                continue
            key, transpose = rest
            out[f"layers.{i}.blocks.{b}.{key}"] = v.T if transpose else v
        elif top.startswith("layers_") and top.endswith("_downsample"):
            i = top[len("layers_"):-len("_downsample")]
            out[f"layers.{i}.downsample." + _merge_suffix(path)] = _merge_value(path, v)
        elif top == "local_feat_proj":
            out["local_feat_proj." + _merge_suffix(path)] = _merge_value(path, v)
        elif top in ("norm", "norm_local"):
            out[f"{top}." + ("weight" if path[1] == "scale" else "bias")] = v
    return out


def _merge_suffix(path: tuple[str, ...]) -> str:
    if path[1] == "reduction":
        return "reduction.weight"
    return "norm." + ("weight" if path[2] == "scale" else "bias")


def _merge_value(path: tuple[str, ...], v: np.ndarray) -> np.ndarray:
    return v.T if path[1] == "reduction" else v


def lfvila_flax_to_torch(params: Mapping) -> dict[str, np.ndarray]:
    """LfVilaPretrain param tree -> reference-keyed state dict
    (inverse of ``lf_vila.convert.lfvila_torch_to_flax``)."""
    out: dict[str, np.ndarray] = {}
    if "video_encoder" in params:
        for k, v in swin3d_flax_to_torch(params["video_encoder"]).items():
            out[f"video_encoder.{k}"] = v
    if "text_encoder" in params:
        te = dict(params["text_encoder"])
        pooler = te.pop("pooler", None)
        for k, v in bert_flax_to_torch(
            te, pooler=pooler, mlm=params.get("cls"),
            prefix="text_encoder.bert.", mlm_prefix="text_encoder.cls.predictions.",
        ).items():
            out[k] = v
    if "seq_relationship" in params:
        out["text_encoder.seq_relationship.weight"] = np.asarray(
            params["seq_relationship"]["kernel"]
        ).T
        out["text_encoder.seq_relationship.bias"] = np.asarray(
            params["seq_relationship"]["bias"]
        )
    for proj in ("video_local_proj", "text_local_proj", "video_global_proj", "text_global_proj"):
        if proj in params:
            out[f"{proj}.weight"] = np.asarray(params[proj]["kernel"]).T
            out[f"{proj}.bias"] = np.asarray(params[proj]["bias"])
    if "sent_embedding" in params:
        s = params["sent_embedding"]
        out["sent_embedding.position_embeddings.weight"] = np.asarray(
            s["position_embeddings"]["embedding"]
        )
        out["sent_embedding.segment_embeddings.weight"] = np.asarray(
            s["segment_embeddings"]["embedding"]
        )
        out["sent_embedding.norm.weight"] = np.asarray(s["norm"]["scale"])
        out["sent_embedding.norm.bias"] = np.asarray(s["norm"]["bias"])
    if "video_token_pos" in params:
        v = params["video_token_pos"]
        out["video_token_pos.s_pos_embed"] = np.asarray(v["s_pos_embed"])
        out["video_token_pos.t_pos_embed"] = np.asarray(v["t_pos_embed"])
        out["video_token_pos.norm.weight"] = np.asarray(v["norm"]["scale"])
        out["video_token_pos.norm.bias"] = np.asarray(v["norm"]["bias"])
    return out


# ---------------------------------------------------------------------------
# HD-VILA
# ---------------------------------------------------------------------------

_BN_BACK = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}


def resnet_flax_to_torch(params: Mapping) -> dict[str, np.ndarray]:
    """Inverse of ``hd_vila.convert.resnet_torch_to_flax``."""
    out: dict[str, np.ndarray] = {}
    for path, v in _flatten(params):
        top = path[0]
        if top == "conv1":
            out["conv1.weight"] = _conv_back(v)
        elif top == "bn1":
            out[f"bn1.{_BN_BACK[path[1]]}"] = v
        elif "_" in top and top.startswith("layer"):
            stage, block = top[len("layer"):].split("_")
            mod = path[1]
            if mod.startswith("conv"):
                out[f"layer{stage}.{block}.{mod}.weight"] = _conv_back(v)
            elif mod.startswith("bn"):
                out[f"layer{stage}.{block}.{mod}.{_BN_BACK[path[2]]}"] = v
            elif mod == "downsample_conv":
                out[f"layer{stage}.{block}.downsample.0.weight"] = _conv_back(v)
            elif mod == "downsample_bn":
                out[f"layer{stage}.{block}.downsample.1.{_BN_BACK[path[2]]}"] = v
    return out


_TSF_BLOCK_BACK = {
    ("norm1", "scale"): ("norm1.weight", False),
    ("norm1", "bias"): ("norm1.bias", False),
    ("norm2", "scale"): ("norm2.weight", False),
    ("norm2", "bias"): ("norm2.bias", False),
    ("temporal_norm1", "scale"): ("temporal_norm1.weight", False),
    ("temporal_norm1", "bias"): ("temporal_norm1.bias", False),
    ("attn", "qkv", "kernel"): ("attn.qkv.weight", True),
    ("attn", "qkv", "bias"): ("attn.qkv.bias", False),
    ("attn", "proj", "kernel"): ("attn.proj.weight", True),
    ("attn", "proj", "bias"): ("attn.proj.bias", False),
    ("temporal_attn", "qkv", "kernel"): ("temporal_attn.qkv.weight", True),
    ("temporal_attn", "qkv", "bias"): ("temporal_attn.qkv.bias", False),
    ("temporal_attn", "proj", "kernel"): ("temporal_attn.proj.weight", True),
    ("temporal_attn", "proj", "bias"): ("temporal_attn.proj.bias", False),
    ("temporal_fc", "kernel"): ("temporal_fc.weight", True),
    ("temporal_fc", "bias"): ("temporal_fc.bias", False),
    ("mlp_fc1", "kernel"): ("mlp.fc1.weight", True),
    ("mlp_fc1", "bias"): ("mlp.fc1.bias", False),
    ("mlp_fc2", "kernel"): ("mlp.fc2.weight", True),
    ("mlp_fc2", "bias"): ("mlp.fc2.bias", False),
}


def timesformer_flax_to_torch(params: Mapping) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for path, v in _flatten(params):
        if path[0] in ("pos_embed", "time_embed"):
            out[path[0]] = v
        elif path[0].startswith("blocks_"):
            i = path[0][len("blocks_"):]
            rest = _TSF_BLOCK_BACK.get(path[1:])
            if rest is None:
                continue
            key, transpose = rest
            out[f"blocks.{i}.{key}"] = v.T if transpose else v
    return out


def hdvila_e2e_flax_to_torch(params: Mapping) -> dict[str, np.ndarray]:
    """{encoder, transformer} trees -> reference e2e state dict
    (inverse of ``hd_vila.convert.hdvila_e2e_torch_to_flax``)."""
    out: dict[str, np.ndarray] = {}
    enc = params.get("encoder", {})
    for cnn in ("cnn", "cnn_low"):
        if cnn in enc:
            for k, v in resnet_flax_to_torch(enc[cnn]).items():
                out[f"{cnn}.{k}"] = v
    for fname, tname in (
        ("grid_encoder_conv", "grid_encoder"),
        ("grid_encoder_low_conv", "grid_encoder_low"),
        ("grid_encoder_combine_conv", "grid_encoder_combine"),
    ):
        if fname in enc:
            out[f"{tname}.0.weight"] = _conv_back(np.asarray(enc[fname]["kernel"]))
    if "timesformer" in enc:
        for k, v in timesformer_flax_to_torch(enc["timesformer"]).items():
            out[f"timesformer.{k}"] = v

    tr = params.get("transformer", {})
    base = tr.get("bert_model", {})
    if "bert" in base:
        for k, v in bert_flax_to_torch(
            base["bert"], mlm=tr.get("cls"),
            prefix="transformer.bert.", mlm_prefix="transformer.cls.predictions.",
        ).items():
            out[k] = v
    for pooler in ("pooler1", "pooler2"):
        if pooler in base:
            d = base[pooler]["dense"]
            out[f"transformer.bert.{pooler}.dense.weight"] = np.asarray(d["kernel"]).T
            out[f"transformer.bert.{pooler}.dense.bias"] = np.asarray(d["bias"])
    vis = base.get("visual_embeddings", {})
    for emb in ("row_position_embeddings", "col_position_embeddings"):
        if emb in vis:
            out[f"transformer.bert.visual_embeddings.{emb}.weight"] = np.asarray(
                vis[emb]["embedding"]
            )
    if "token_type_embedding" in vis:
        out["transformer.bert.visual_embeddings.token_type_embeddings.weight"] = np.asarray(
            vis["token_type_embedding"]
        ).reshape(1, -1)
    if "LayerNorm" in vis:
        out["transformer.bert.visual_embeddings.LayerNorm.weight"] = np.asarray(
            vis["LayerNorm"]["scale"]
        )
        out["transformer.bert.visual_embeddings.LayerNorm.bias"] = np.asarray(
            vis["LayerNorm"]["bias"]
        )
    for proj in ("t_proj", "v_proj"):
        if proj in tr:
            out[f"transformer.{proj}.weight"] = np.asarray(tr[proj]["kernel"]).T
            out[f"transformer.{proj}.bias"] = np.asarray(tr[proj]["bias"])
    if "seq_relationship" in tr:
        out["transformer.cls.seq_relationship.weight"] = np.asarray(
            tr["seq_relationship"]["kernel"]
        ).T
        out["transformer.cls.seq_relationship.bias"] = np.asarray(tr["seq_relationship"]["bias"])
    return out
