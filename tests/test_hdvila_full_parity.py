"""FULL HD-VILA parity: hybrid e2e encoder + two-stage BERT vs the reference.

Loads the reference ``e2e_model.py`` composition with mmcv/transformers-era
shims, converts the whole checkpoint via ``hdvila_e2e_torch_to_flax`` and
compares stage-1 ITC features end to end (ResNet → grid encoders → 1/4
interpolation → TimeSformer middle-slice → combine → BERT stage-1 → ITC
projections).
"""

import collections.abc
import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

HDVILA_ROOT = "/root/reference/hd-vila"


pytestmark = pytest.mark.slow

def _mod(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def reference_hdvila():
    if not os.path.exists(HDVILA_ROOT):
        pytest.skip("reference tree not mounted")
    import torch.nn as tnn

    # ---- mmcv shims -------------------------------------------------------
    class BaseModule(tnn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

        def init_weights(self):
            pass

    class Sequential(tnn.Sequential):
        def __init__(self, *args, init_cfg=None):
            super().__init__(*args)

    def build_conv_layer(cfg, *args, **kwargs):
        return tnn.Conv2d(*args, **kwargs)

    def build_norm_layer(cfg, num_features, postfix=""):
        return f"bn{postfix}", tnn.BatchNorm2d(num_features)

    _mod("mmcv")
    _mod("mmcv.runner", BaseModule=BaseModule, Sequential=Sequential,
         load_checkpoint=lambda *a, **k: None)
    _mod("mmcv.cnn", build_conv_layer=build_conv_layer, build_norm_layer=build_norm_layer,
         build_plugin_layer=lambda *a, **k: (_ for _ in ()).throw(NotImplementedError))

    six = _mod("torch._six")
    six.container_abcs = collections.abc

    # ---- transformers-era shims ------------------------------------------
    import transformers
    import transformers.activations as ta

    if not hasattr(ta, "gelu"):
        ta.gelu = tnn.functional.gelu
    if not hasattr(ta, "gelu_new"):
        ta.gelu_new = ta.ACT2FN["gelu_new"]
    if not hasattr(ta, "swish"):
        ta.swish = tnn.functional.silu
    from transformers.models.bert import configuration_bert as cb

    sys.modules.setdefault("transformers.configuration_bert", cb)
    import transformers.file_utils as fu

    if not hasattr(fu, "add_start_docstrings_to_callable"):
        fu.add_start_docstrings_to_callable = fu.add_start_docstrings_to_model_forward \
            if hasattr(fu, "add_start_docstrings_to_model_forward") \
            else (lambda *docstr: (lambda fn: fn))
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))

    # ---- src package over the reference tree ------------------------------
    src = _mod("src")
    src.__path__ = [os.path.join(HDVILA_ROOT, "src")]
    sd = _mod("src.datasets")
    sd.__path__ = []

    def repeat_tensor_rows(raw_tensor, row_repeats):
        return raw_tensor.repeat_interleave(torch.tensor(row_repeats), dim=0)

    _mod("src.datasets.data_utils", repeat_tensor_rows=repeat_tensor_rows)
    su = _mod("src.utils")
    su.__path__ = []
    _mod("src.utils.load_save", load_state_dict_with_mismatch=lambda *a, **k: None)
    _mod("src.utils.basic_utils", flat_list_of_lists=lambda ls: [x for s in ls for x in s])
    _mod("src.utils.logger", LOGGER=__import__("logging").getLogger("ref"))

    from src.modeling.e2e_model import HDVILA  # noqa: PLC0415

    return HDVILA


def test_full_hdvila_stage1_parity(reference_hdvila):
    from transformers import BertConfig as HFBertConfig

    from xpretrain_tpu.cli.run_pretrain_hdvila import HdVilaPretrainModel
    from xpretrain_tpu.models.bert import BertConfig
    from xpretrain_tpu.models.hd_vila.convert import hdvila_e2e_torch_to_flax
    from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoderConfig
    from xpretrain_tpu.models.hd_vila.modeling import HdVilaModelConfig

    hidden = 64
    cfg = HFBertConfig(
        vocab_size=300, hidden_size=hidden, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=128, max_position_embeddings=64,
        type_vocab_size=2, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    for key, value in dict(
        stage=1, resnet_depth=18, resnet_frozen_stage=-1,
        backbone_channel_in_size=512, backbone_channels=[64, 128, 256, 512],
        timesformer_depth=1, timesformer_heads=4, timesformer_type="new",
        score_agg_func="mean", bert_mean=True, max_grid_row_position_embeddings=100,
        max_grid_col_position_embeddings=100, pixel_random_sampling_size=0,
        classifier="mlp", cls_hidden_scale=2, loss_type="ce", margin=0.1,
    ).items():
        setattr(cfg, key, value)
    torch.manual_seed(0)
    ref = reference_hdvila(cfg, stage=1)
    ref.eval()
    # BN running stats are fresh-init (mean 0 var 1); randomize for a real test
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.8, 1.2)

    # trained pos-embed grid is (10, 16); runtime grid (2, 3) interpolates
    enc_cfg = HdVilaEncoderConfig(
        resnet_depth=18, hidden_size=hidden, timesformer_depth=1, timesformer_heads=4,
        timesformer_frames=7, timesformer_hw=(10, 16),
    )
    model_cfg = HdVilaModelConfig(
        bert=BertConfig(
            vocab_size=300, hidden_size=hidden, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=128, max_position_embeddings=64,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            stage_bounds=(2,),
        ),
        stage=1,
        pixel_random_sampling_size=0,
        bert_mean=True,
    )
    model = HdVilaPretrainModel(enc_cfg, model_cfg)
    converted = hdvila_e2e_torch_to_flax(ref.state_dict())
    params = {"encoder": converted["encoder"], "transformer": converted["transformer"]}

    # torch -> flax -> torch round-trip: every exported key must exist in the
    # reference state dict with identical values (VERDICT r1 item 10)
    from xpretrain_tpu.models.export import hdvila_e2e_flax_to_torch
    _sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    _exported = hdvila_e2e_flax_to_torch(params)
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
    B, clips, frm = 2, 2, 3
    img_middle = rng.integers(0, 255, size=(B, clips, 3, 128, 192)).astype(np.float32)
    img_other = rng.integers(0, 255, size=(B, clips, frm - 1, 3, 32, 48)).astype(np.float32)
    ids = rng.integers(2, 299, size=(B, 12))
    mask = np.ones((B, 12), np.int64)
    mask[1, 9:] = 0

    with torch.no_grad():
        want = ref(
            torch.tensor(img_middle), torch.tensor(img_other),
            torch.tensor(ids), torch.tensor(mask),
        )
    got = model.apply(
        {"params": params},
        jnp.asarray(img_middle), jnp.asarray(img_other),
        jnp.asarray(ids), jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(got["text_features"]), want["text_features"].numpy(), atol=1e-4,
        err_msg="ITC text features mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(got["vis_features"]), want["vis_features"].numpy(), atol=1e-4,
        err_msg="ITC visual features mismatch",
    )


def test_full_hdvila_stage2_parity(reference_hdvila):
    from transformers import BertConfig as HFBertConfig

    from xpretrain_tpu.cli.run_pretrain_hdvila import HdVilaPretrainModel
    from xpretrain_tpu.models.bert import BertConfig
    from xpretrain_tpu.models.hd_vila.convert import hdvila_e2e_torch_to_flax
    from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoderConfig
    from xpretrain_tpu.models.hd_vila.modeling import HdVilaModelConfig

    hidden = 64
    cfg = HFBertConfig(
        vocab_size=300, hidden_size=hidden, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=128, max_position_embeddings=64,
        type_vocab_size=2, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    for key, value in dict(
        stage=2, resnet_depth=18, resnet_frozen_stage=-1,
        backbone_channel_in_size=512, backbone_channels=[64, 128, 256, 512],
        timesformer_depth=1, timesformer_heads=4, timesformer_type="new",
        score_agg_func="mean", bert_mean=True, max_grid_row_position_embeddings=100,
        max_grid_col_position_embeddings=100, pixel_random_sampling_size=0,
        classifier="mlp", cls_hidden_scale=2, loss_type="ce", margin=0.1,
    ).items():
        setattr(cfg, key, value)
    torch.manual_seed(2)
    ref = reference_hdvila(cfg, stage=2)
    ref.eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.8, 1.2)

    enc_cfg = HdVilaEncoderConfig(
        resnet_depth=18, hidden_size=hidden, timesformer_depth=1, timesformer_heads=4,
        timesformer_frames=7, timesformer_hw=(10, 16),
    )
    model_cfg = HdVilaModelConfig(
        bert=BertConfig(
            vocab_size=300, hidden_size=hidden, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=128, max_position_embeddings=64,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0, stage_bounds=(2,),
        ),
        stage=2, pixel_random_sampling_size=0, bert_mean=True,
    )
    model = HdVilaPretrainModel(enc_cfg, model_cfg)
    converted = hdvila_e2e_torch_to_flax(ref.state_dict())
    params = {"encoder": converted["encoder"], "transformer": converted["transformer"]}

    rng = np.random.default_rng(2)
    B, clips, frm = 2, 2, 3
    img_middle = rng.integers(0, 255, size=(B, clips, 3, 128, 192)).astype(np.float32)
    img_other = rng.integers(0, 255, size=(B, clips, frm - 1, 3, 32, 48)).astype(np.float32)
    ids = rng.integers(2, 299, size=(B, 12))
    mask = np.ones((B, 12), np.int64)
    mlm_labels = np.full((B, 12), -100)
    mlm_labels[:, [2, 5]] = rng.integers(2, 299, size=(B, 2))
    itm_labels = np.array([1, 0])

    with torch.no_grad():
        want = ref(
            torch.tensor(img_middle), torch.tensor(img_other),
            torch.tensor(ids), torch.tensor(mask),
            mlm_labels=torch.tensor(mlm_labels.copy()), itm_labels=torch.tensor(itm_labels),
        )
    got = model.apply(
        {"params": params},
        jnp.asarray(img_middle), jnp.asarray(img_other),
        jnp.asarray(ids), jnp.asarray(mask),
        mlm_labels=jnp.asarray(mlm_labels), itm_labels=jnp.asarray(itm_labels),
    )
    np.testing.assert_allclose(
        float(got["mlm_loss"]), float(want["mlm_loss"]), atol=3e-4, err_msg="mlm loss"
    )
    np.testing.assert_allclose(
        float(got["itm_loss"]), float(want["itm_loss"]), atol=3e-4, err_msg="itm loss"
    )
