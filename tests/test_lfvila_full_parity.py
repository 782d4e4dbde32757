"""FULL LF-VILA stage-1 parity: our LfVilaPretrain vs the reference model.

Loads the reference ``lfvila_pretrain.py`` composition (Swin3D + 3-stage
BERT + sentence embeddings + projections) with its unavailable deps stubbed,
converts the whole checkpoint via ``lfvila_torch_to_flax`` and compares the
stage-1 global features and the contrastive loss end to end.
"""

import collections.abc
import importlib.machinery
import json
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from xpretrain_tpu.config import ConfigDict  # noqa: E402
from xpretrain_tpu.models.bert import BertConfig  # noqa: E402
from xpretrain_tpu.models.lf_vila.convert import lfvila_torch_to_flax  # noqa: E402
from xpretrain_tpu.models.lf_vila.pretrain import LfVilaConfig, LfVilaPretrain  # noqa: E402
from xpretrain_tpu.models.lf_vila.swin3d import Swin3DConfig  # noqa: E402

LFVILA_ROOT = "/root/reference/LF-VILA"


pytestmark = pytest.mark.slow

def _mod(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def reference_lfvila():
    if not os.path.exists(LFVILA_ROOT):
        pytest.skip("reference tree not mounted")

    class DP(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    class Blk(torch.nn.Module):
        def forward(self, x):
            return x

    _mod("timm")
    _mod("timm.models")
    _mod(
        "timm.models.layers",
        DropPath=DP,
        trunc_normal_=lambda t, std=0.02: torch.nn.init.trunc_normal_(t, std=std),
    )
    _mod("timm.models.vision_transformer", Block=Blk)
    _mod("mmcv")
    _mod("mmcv.runner", load_checkpoint=lambda *a, **k: None)
    six = _mod("torch._six")
    six.container_abcs = collections.abc
    import logging

    src = _mod("src")
    src.__path__ = [os.path.join(LFVILA_ROOT, "src")]
    su = _mod("src.utils")
    su.__path__ = []
    _mod("src.utils.logger", LOGGER=logging.getLogger("ref"))

    class SyncFunction:
        @staticmethod
        def apply(x):
            return x

    def vector_gather(vectors, indices):
        return torch.stack([vectors[b, indices[b]] for b in range(vectors.shape[0])])

    _mod("src.utils.dist", SyncFunction=SyncFunction, master_process=lambda *a, **k: True)
    _mod("src.utils.misc", vector_gather=vector_gather)

    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for name in (
        "apply_chunking_to_forward",
        "find_pruneable_heads_and_indices",
        "prune_linear_layer",
    ):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))

    from src.models.lfvila_pretrain import LFVILA_Pretrain  # noqa: PLC0415

    return LFVILA_Pretrain


VIDEO_KW = dict(
    patch_size=[1, 8, 8],
    embed_dim=16,
    depths=[2, 2, 2, 2, 2, 2],
    num_heads=[2, 2, 2, 2, 2, 2],
    stages=[0, 1, 2, 2, 2, 3],
    downsample_stages=[0, 1, 4],
    window_size=[[2, 3, 5], [4, 3, 5], [8, 3, 5], [16, 3, 5], [16, 3, 5], [32, 3, 5]],
    drop_path_rate=0.0,
    local_window=4,
)
HIDDEN = 128  # == swin num_features 16 * 2^3


def test_full_stage1_parity(reference_lfvila, tmp_path):
    bert_json = tmp_path / "bert.json"
    bert_json.write_text(
        json.dumps(
            {
                "vocab_size": 300,
                "hidden_size": HIDDEN,
                "num_hidden_layers": 6,
                "num_attention_heads": 4,
                "intermediate_size": 256,
                "max_position_embeddings": 128,
                "type_vocab_size": 8,
                "hidden_dropout_prob": 0.0,
                "attention_probs_dropout_prob": 0.0,
            }
        )
    )
    ref_cfg = ConfigDict(
        VideoEncoder=dict(**VIDEO_KW, pretrained=None, pretrained2d=False),
        bert_config=str(bert_json),
        stage=1,
        num_local_layers=2,
        stage1_layers=4,
        bert_frozen_stage=-1,
        type_vocab_size=8,
        DATA=dict(sample_clip=4, sample_frame=16),
        TRAINING=dict(
            temp=0.05,
            time_temp=0.05,
            num_key=2,
            num_value=2,
            num_other_neg=3,
            use_time_match=False,
            ct_global_loss_weight=1.0,
            ct_time_loss_weight=1.0,
        ),
    )
    args = ConfigDict(
        distributed=False, use_sparse_attention=False, deepspeed_sparse_attention=False
    )
    torch.manual_seed(0)
    ref = reference_lfvila(args, ref_cfg)
    ref.eval()

    ours_cfg = LfVilaConfig(
        video=Swin3DConfig(
            patch_size=(1, 8, 8),
            embed_dim=16,
            depths=(2,) * 6,
            num_heads=(2,) * 6,
            stages=(0, 1, 2, 2, 2, 3),
            downsample_stages=(0, 1, 4),
            window_size=tuple(tuple(w) for w in VIDEO_KW["window_size"]),
            drop_path_rate=0.0,
            local_window=4,
        ),
        bert=BertConfig(
            vocab_size=300,
            hidden_size=HIDDEN,
            num_hidden_layers=6,
            num_attention_heads=4,
            intermediate_size=256,
            max_position_embeddings=128,
            type_vocab_size=8,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            stage_bounds=(2, 4),
        ),
        stage=1,
        sample_clip=4,
        sample_frame=16,
        temp=0.05,
        use_time_match=False,
    )
    model = LfVilaPretrain(ours_cfg)
    params = lfvila_torch_to_flax(ref.state_dict())

    # torch -> flax -> torch round-trip: every exported key must exist in the
    # reference state dict with identical values (VERDICT r1 item 10)
    from xpretrain_tpu.models.export import lfvila_flax_to_torch
    _sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    _exported = lfvila_flax_to_torch(params)
    assert _exported, "export produced nothing"
    for _k, _v in _exported.items():
        assert _k in _sd, f"exported unknown key {_k}"
        np.testing.assert_allclose(_v, _sd[_k], rtol=1e-6, atol=1e-6, err_msg=_k)
    _skip = ("relative_position_index", "num_batches_tracked", "attn_mask",
             "position_ids", "temp", "logit_scale")
    _missed = [k for k in _sd if k not in _exported
               and not any(p in k for p in _skip)
               and k not in ("timesformer.norm.weight", "timesformer.norm.bias")]
    assert not _missed, f"import-only keys not re-exported: {_missed[:8]}"


    rng = np.random.default_rng(0)
    B, M, L = 2, 4, 10
    video = rng.normal(size=(B, 3, 16, 96, 160)).astype(np.float32)
    ids = rng.integers(2, 299, size=(B, M, L))
    mask = np.ones((B, M, L), np.int64)
    mask[0, 1, 6:] = 0

    with torch.no_grad():
        want = ref(
            torch.tensor(video),
            torch.tensor(ids),
            torch.tensor(mask),
            stage=1,
            is_train=False,
            is_pretrain_val=True,
        )
    got = model.apply(
        {"params": params}, jnp.asarray(video), jnp.asarray(ids), jnp.asarray(mask), stage=1
    )

    np.testing.assert_allclose(
        np.asarray(got["video_global_feat"]), want["video_global_feat"].numpy(), atol=5e-5,
        err_msg="video global features mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(got["text_global_feat"]), want["text_global_feat"].numpy(), atol=5e-5,
        err_msg="text global features mismatch",
    )
    np.testing.assert_allclose(
        float(got["ct_global_loss"]), float(want["ct_global_loss"]), atol=1e-4,
        err_msg="contrastive loss mismatch",
    )


def test_full_stage2_parity(reference_lfvila, tmp_path):
    bert_json = tmp_path / "bert2.json"
    bert_json.write_text(
        json.dumps(
            {
                "vocab_size": 300,
                "hidden_size": HIDDEN,
                "num_hidden_layers": 6,
                "num_attention_heads": 4,
                "intermediate_size": 256,
                "max_position_embeddings": 128,
                "type_vocab_size": 8,
                "hidden_dropout_prob": 0.0,
                "attention_probs_dropout_prob": 0.0,
            }
        )
    )
    ref_cfg = ConfigDict(
        VideoEncoder=dict(**VIDEO_KW, pretrained=None, pretrained2d=False),
        bert_config=str(bert_json),
        stage=2,
        num_local_layers=2,
        stage1_layers=4,
        bert_frozen_stage=-1,
        type_vocab_size=8,
        final_num_patches=1,
        DATA=dict(sample_clip=4, sample_frame=16),
        TRAINING=dict(
            temp=0.05, time_temp=0.05, num_key=2, num_value=2, num_other_neg=3,
            use_time_match=False, ct_global_loss_weight=1.0, ct_time_loss_weight=1.0,
            mlm_loss_weight=1.0, vtm_loss_weight=10.0,
        ),
    )
    # the reference reads loss weights from cfg.TRAINING at forward time
    args = ConfigDict(
        distributed=False, use_sparse_attention=False, deepspeed_sparse_attention=False
    )
    torch.manual_seed(1)
    # reference bug: stage-2 __init__ calls _freeze_stage_one_params before
    # self.sent_embedding exists (lfvila_pretrain.py:66-77 ordering) and would
    # crash; freezing has no effect on eval outputs, so no-op it for parity
    orig_freeze = reference_lfvila._freeze_stage_one_params
    reference_lfvila._freeze_stage_one_params = lambda self: None
    try:
        ref = reference_lfvila(args, ref_cfg)
    finally:
        reference_lfvila._freeze_stage_one_params = orig_freeze
    ref.eval()

    ours_cfg = LfVilaConfig(
        video=Swin3DConfig(
            patch_size=(1, 8, 8), embed_dim=16, depths=(2,) * 6, num_heads=(2,) * 6,
            stages=(0, 1, 2, 2, 2, 3), downsample_stages=(0, 1, 4),
            window_size=tuple(tuple(w) for w in VIDEO_KW["window_size"]),
            drop_path_rate=0.0, local_window=4,
        ),
        bert=BertConfig(
            vocab_size=300, hidden_size=HIDDEN, num_hidden_layers=6,
            num_attention_heads=4, intermediate_size=256, max_position_embeddings=128,
            type_vocab_size=8, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, stage_bounds=(2, 4),
        ),
        stage=2,
        sample_clip=4,
        sample_frame=16,
        final_num_patches=1,
        mlm_loss_weight=1.0,
        vtm_loss_weight=10.0,
    )
    model = LfVilaPretrain(ours_cfg)
    params = lfvila_torch_to_flax(ref.state_dict())

    rng = np.random.default_rng(1)
    B, M, L = 2, 4, 10
    video = rng.normal(size=(B, 3, 16, 96, 160)).astype(np.float32)
    ids = rng.integers(2, 299, size=(B, M, L))
    mask = np.ones((B, M, L), np.int64)
    mlm_labels = np.full((B, M * L), -100)
    mlm_labels[:, [3, 17]] = rng.integers(2, 299, size=(B, 2))

    with torch.no_grad():
        want = ref(
            torch.tensor(video), torch.tensor(ids), torch.tensor(mask),
            mlm_labels=torch.tensor(mlm_labels), stage=2, is_train=True,
        )
    got = model.apply(
        {"params": params}, jnp.asarray(video), jnp.asarray(ids), jnp.asarray(mask),
        mlm_labels=jnp.asarray(mlm_labels), stage=2,
    )
    np.testing.assert_allclose(
        float(got["mlm_loss"]), float(want["mlm_loss"]), atol=2e-4, err_msg="mlm loss"
    )
    np.testing.assert_allclose(
        float(got["vtm_loss"]), float(want["vtm_loss"]), atol=2e-4, err_msg="vtm loss"
    )
    np.testing.assert_allclose(
        float(got["mlm_acc"]), float(want["mlm_acc"]), atol=1e-6, err_msg="mlm acc"
    )
