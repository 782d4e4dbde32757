"""CLI-facing pretrained-weight loading for the HD-VILA and LF-VILA families.

The converters (``models/hd_vila/convert.py``, ``models/lf_vila/convert.py``,
``models/bert_convert.py``) are parity-tested against the live reference
modules; this module is the runner-side plumbing that the reference exposes
as config knobs:

- HD-VILA: ``--e2e_weights_path`` loads a full reference ``HDVILA`` torch
  checkpoint (the stage-2 recipe restores stage-1 e2e weights this way,
  ref ``run_pretrain_stage2_group.py:138-144``; fine-tunes restore e2e or
  task checkpoints via ``load_state_dict_with_mismatch``,
  ``hd-vila/src/utils/load.py``).
- LF-VILA: the WEIGHTS cascade of ``LF-VILA/src/run_pretrain.py:52-77`` —
  ``model_weight`` (full) | ``stage1_model_weight`` (+``bert_weight``) |
  ``swin_weight`` (2-D inflated when ``pretrained_2d``) + ``bert_weight``.

All loads are shape-tolerant merges into the fresh init (mismatches keep
the init, matching the reference's ``load_model_weights_with_mismatch``).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from xpretrain_tpu.utils.logging import LOGGER


def merge_into(init_params: Mapping, converted: Mapping, scope: str = "") -> dict:
    """Shape-tolerant recursive merge of a converted tree into init params."""
    from xpretrain_tpu.models.clip_vip.convert import jax_tree_to_dict

    def merge(dst, src, path=""):
        for key, value in src.items():
            if key not in dst:
                LOGGER.warning("merge: unexpected key %s%s — skipped", path, key)
                continue
            if isinstance(value, Mapping):
                merge(dst[key], value, f"{path}{key}/")
            elif np.shape(dst[key]) != np.shape(value):
                LOGGER.warning(
                    "merge: shape mismatch at %s%s: %s vs %s — keeping init",
                    path, key, np.shape(dst[key]), np.shape(value),
                )
            else:
                dst[key] = np.asarray(value, dtype=np.float32)

    import copy

    merged = copy.deepcopy(jax_tree_to_dict(init_params))
    target = merged
    if scope:
        if scope not in target:
            LOGGER.warning("merge: scope %r not in params — nothing loaded", scope)
            return merged
        target = target[scope]
    merge(target, converted)
    return merged


def load_hdvila_e2e(init_params: Mapping, path: str) -> dict:
    """Merge a reference HDVILA e2e torch checkpoint into init params.

    The converted tree is ``{"encoder": ..., "transformer": ...}`` matching
    :class:`HdVilaPretrainModel`'s submodule names; for task models whose
    tree differs (e.g. the rerank head) the shape-tolerant merge loads the
    shared encoder and warns on the rest.
    """
    from xpretrain_tpu.models.clip_vip.convert import load_torch_checkpoint
    from xpretrain_tpu.models.hd_vila.convert import hdvila_e2e_torch_to_flax

    sd = load_torch_checkpoint(path)
    converted = dict(hdvila_e2e_torch_to_flax(sd))
    if "transformer" in converted and "transformer" not in init_params and "head" in init_params:
        # task models (QA/MC/regression/rerank) hold the staged BERT inside
        # their head module — route the pretraining transformer's shared
        # submodule there (the task-specific classifier keeps its init)
        trans = converted.pop("transformer")
        # route every shared submodule the task head also declares — the
        # rerank head reuses the pretraining t_proj/v_proj for its dual-
        # encoder eval scores (modeling.py:409-410), not just bert_model;
        # task-specific classifiers are absent from the checkpoint and
        # keep their init
        routed = {k: v for k, v in trans.items() if k in init_params["head"]}
        if routed:
            converted["head"] = routed
    LOGGER.info("loaded HD-VILA e2e weights from %s", path)
    return merge_into(init_params, converted)


def load_lfvila_cascade(
    init_params: Mapping,
    model_weight: str = "",
    stage1_model_weight: str = "",
    swin_weight: str = "",
    bert_weight: str = "",
    pretrained_2d: bool = True,
    swin_config=None,
) -> dict:
    """The reference's WEIGHTS cascade (``run_pretrain.py:52-77``).

    Priority: full ``model_weight`` > ``stage1_model_weight`` (bert loaded
    first so stage-1 keys win) > per-encoder ``swin_weight``/``bert_weight``.
    ``swin_config`` (a :class:`Swin3DConfig`; default-constructed when None)
    supplies the per-stage windows / depths / downsample stages / patch size
    that drive the 2-D inflation (ref ``load.py:199-238`` reads the same
    geometry off the live model).
    """
    from xpretrain_tpu.models.bert_convert import bert_torch_to_flax
    from xpretrain_tpu.models.clip_vip.convert import load_torch_checkpoint
    from xpretrain_tpu.models.lf_vila.convert import (
        inflate_swin2d_to_3d,
        lfvila_torch_to_flax,
        swin3d_torch_to_flax,
    )

    params: Any = init_params
    if model_weight:
        converted = lfvila_torch_to_flax(load_torch_checkpoint(model_weight))
        LOGGER.info("loaded full LF-VILA weights from %s", model_weight)
        return merge_into(params, converted)

    if stage1_model_weight:
        if bert_weight:
            bert, pooler, mlm = bert_torch_to_flax(load_torch_checkpoint(bert_weight))
            if pooler:
                bert["pooler"] = pooler
            params = merge_into(params, bert, scope="text_encoder")
            if mlm:
                params = merge_into(params, mlm, scope="cls")
            LOGGER.info("loaded BERT weights from %s", bert_weight)
        converted = lfvila_torch_to_flax(load_torch_checkpoint(stage1_model_weight))
        LOGGER.info("loaded LF-VILA stage-1 weights from %s", stage1_model_weight)
        return merge_into(params, converted)

    if swin_weight:
        sd = load_torch_checkpoint(swin_weight)
        if pretrained_2d:
            if swin_config is None:
                from xpretrain_tpu.models.lf_vila.swin3d import Swin3DConfig

                swin_config = Swin3DConfig()
            sd = inflate_swin2d_to_3d(
                sd,
                swin_config.window_size,
                depths3d=tuple(swin_config.depths),
                downsample_stages3d=tuple(swin_config.downsample_stages),
                patch_size3d=tuple(swin_config.patch_size),
            )
        params = merge_into(params, swin3d_torch_to_flax(sd), scope="video_encoder")
        LOGGER.info(
            "loaded %sSwin weights from %s", "inflated 2-D " if pretrained_2d else "", swin_weight
        )
    if bert_weight:
        bert, pooler, mlm = bert_torch_to_flax(load_torch_checkpoint(bert_weight))
        if pooler:
            bert["pooler"] = pooler
        params = merge_into(params, bert, scope="text_encoder")
        if mlm:
            params = merge_into(params, mlm, scope="cls")
        LOGGER.info("loaded BERT weights from %s", bert_weight)
    return params
