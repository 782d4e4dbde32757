"""HD-VILA family tests: ResNet parity vs torchvision, TimeSformer parity vs
the reference module, hybrid e2e + pretraining heads end-to-end."""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xpretrain_tpu.models.hd_vila.convert import (  # noqa: E402
    resnet_torch_to_flax,
    timesformer_torch_to_flax,
)
from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoder, HdVilaEncoderConfig  # noqa: E402
from xpretrain_tpu.models.hd_vila.modeling import (  # noqa: E402
    HdVilaForMultipleChoice,
    HdVilaForPreTraining,
    HdVilaModelConfig,
)
from xpretrain_tpu.models.hd_vila.resnet import ResNet  # noqa: E402
from xpretrain_tpu.models.hd_vila.timesformer import TimeSformer, TimeSformerConfig  # noqa: E402


pytestmark = pytest.mark.slow

def _torch_resnet18():
    """Minimal torch ResNet-18 with the standard layout (torchvision names)."""
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idt)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            chans = [64, 128, 256, 512]
            for i, c in enumerate(chans):
                cin = 64 if i == 0 else chans[i - 1]
                stride = 1 if i == 0 else 2
                setattr(
                    self,
                    f"layer{i + 1}",
                    tnn.Sequential(BasicBlock(cin, c, stride), BasicBlock(c, c)),
                )

    return Net()


def test_resnet18_parity_vs_torch():
    torch.manual_seed(0)
    ref = _torch_resnet18()
    ref.eval()
    # randomize BN stats so frozen-BN conversion is actually exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    model = ResNet(depth=18)
    params = resnet_torch_to_flax(ref.state_dict())
    x = np.random.default_rng(0).normal(size=(1, 3, 64, 96)).astype(np.float32)

    with torch.no_grad():
        t = torch.tensor(x)
        h = ref.conv1(t)
        h = ref.relu(ref.bn1(h))
        h = ref.maxpool(h)
        wants = []
        for layer in [ref.layer1, ref.layer2, ref.layer3, ref.layer4]:
            h = layer(h)
            wants.append(h.numpy())

    outs = ResNet(depth=18).apply({"params": params}, jnp.asarray(x))
    assert len(outs) == 4
    for got, want in zip(outs, wants):
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    # partial forward consistency
    partial = ResNet(depth=18).apply(
        {"params": params}, jnp.asarray(x), stage=2, method=ResNet.forward_to_stage
    )
    np.testing.assert_allclose(np.asarray(partial), wants[2], atol=1e-4)


@pytest.fixture(scope="module")
def reference_timesformer():
    path = "/root/reference/hd-vila/src/modeling/timesformer.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    # torch 2.x removed torch._six; the reference only needs container_abcs
    import collections.abc
    import types

    six = types.ModuleType("torch._six")
    six.container_abcs = collections.abc
    sys.modules.setdefault("torch._six", six)
    spec = importlib.util.spec_from_file_location("ref_tsf", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_tsf"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_timesformer_parity_vs_reference(reference_timesformer):
    torch.manual_seed(0)
    ref = reference_timesformer.TimeSformer(
        depth=2, num_frames=5, H=4, W=6, embed_dim=32, num_heads=4, drop_path_rate=0.0
    ).eval()
    cfg = TimeSformerConfig(depth=2, num_frames=5, H=4, W=6, embed_dim=32, num_heads=4)
    model = TimeSformer(cfg)
    params = timesformer_torch_to_flax(ref.state_dict())
    # randomize embeddings zero-initialized by the reference for a real test
    with torch.no_grad():
        ref.time_embed.normal_(0, 0.02)
    params = timesformer_torch_to_flax(ref.state_dict())

    x = np.random.default_rng(0).normal(size=(2, 5, 32, 4, 6)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_timesformer_interpolation_parity(reference_timesformer):
    """T and H/W differing from the trained sizes exercise both interps."""
    torch.manual_seed(1)
    ref = reference_timesformer.TimeSformer(
        depth=1, num_frames=5, H=4, W=6, embed_dim=32, num_heads=4, drop_path_rate=0.0
    ).eval()
    with torch.no_grad():
        ref.time_embed.normal_(0, 0.02)
    cfg = TimeSformerConfig(depth=1, num_frames=5, H=4, W=6, embed_dim=32, num_heads=4)
    model = TimeSformer(cfg)
    params = timesformer_torch_to_flax(ref.state_dict())
    x = np.random.default_rng(1).normal(size=(1, 3, 32, 6, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.fixture(scope="module")
def tiny_hdvila():
    enc_cfg = HdVilaEncoderConfig.tiny(timesformer_frames=3, timesformer_hw=(2, 4))
    model_cfg = HdVilaModelConfig.tiny(stage=2, pixel_random_sampling_size=0)
    # hidden sizes must match between encoder output and BERT
    model_cfg = HdVilaModelConfig.tiny(stage=2, pixel_random_sampling_size=0)
    return enc_cfg, model_cfg


def test_hdvila_e2e_pretrain_stage2(tiny_hdvila):
    enc_cfg, model_cfg = tiny_hdvila
    encoder = HdVilaEncoder(enc_cfg)
    transformer = HdVilaForPreTraining(model_cfg)
    rng = np.random.default_rng(0)
    B, clips, frm = 2, 2, 3
    # middle 128x256; others at /4 = 32x64
    img_middle = rng.integers(0, 255, size=(B, clips, 3, 128, 256)).astype(np.float32)
    img_other = rng.integers(0, 255, size=(B, clips, frm - 1, 3, 32, 64)).astype(np.float32)

    enc_params = encoder.init(jax.random.PRNGKey(0), jnp.asarray(img_middle), jnp.asarray(img_other))
    grid = encoder.apply(enc_params, jnp.asarray(img_middle), jnp.asarray(img_other))
    # 128/64=2, 256/64=4 fused grid
    assert grid.shape == (B, clips, 1, 2, 4, enc_cfg.hidden_size)

    ids = rng.integers(2, 1000, size=(B, 10))
    mask = np.ones((B, 10), np.int64)
    mlm_labels = np.full((B, 10), -100)
    mlm_labels[:, 2] = 5
    itm_labels = np.array([1, 0])
    t_params = transformer.init(
        jax.random.PRNGKey(1),
        grid,
        jnp.asarray(ids),
        jnp.asarray(mask),
        mlm_labels=jnp.asarray(mlm_labels),
        itm_labels=jnp.asarray(itm_labels),
    )
    out = transformer.apply(
        t_params,
        grid,
        jnp.asarray(ids),
        jnp.asarray(mask),
        mlm_labels=jnp.asarray(mlm_labels),
        itm_labels=jnp.asarray(itm_labels),
    )
    assert np.isfinite(float(out["mlm_loss"]))
    assert np.isfinite(float(out["itm_loss"]))
    assert out["text_features"].shape == (B, model_cfg.bert.hidden_size)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["vis_features"]), axis=-1), 1.0, rtol=1e-5
    )


def test_hdvila_stage1_itc_only(tiny_hdvila):
    enc_cfg, _ = tiny_hdvila
    model_cfg = HdVilaModelConfig.tiny(stage=1)
    transformer = HdVilaForPreTraining(model_cfg)
    rng = np.random.default_rng(1)
    grid = jnp.asarray(rng.normal(size=(2, 2, 1, 2, 4, 64)).astype(np.float32))
    ids = jnp.asarray(rng.integers(2, 1000, size=(2, 8)))
    mask = jnp.ones((2, 8), jnp.int32)
    params = transformer.init(jax.random.PRNGKey(0), grid, ids, mask)
    out = transformer.apply(params, grid, ids, mask)
    assert set(out) == {"text_features", "vis_features"}


def test_hdvila_multiple_choice(tiny_hdvila):
    _, model_cfg = tiny_hdvila
    model = HdVilaForMultipleChoice(model_cfg)
    rng = np.random.default_rng(2)
    grid = jnp.asarray(rng.normal(size=(2, 2, 1, 2, 4, 64)).astype(np.float32))
    ids = jnp.asarray(rng.integers(2, 1000, size=(2, 5, 8)))
    mask = jnp.ones((2, 5, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), grid, ids, mask)
    out = model.apply(params, grid, ids, mask)
    assert out["logits"].shape == (2, 5)


def test_multiclip_logits_aggregation(tiny_hdvila):
    """Clip aggregation pools LOGITS (ref run_video_qa.py:270-280): the
    2-clip mean-agg output must equal the mean of the two single-clip logit
    sets, and differ from either clip alone."""
    from xpretrain_tpu.models.hd_vila.modeling import HdVilaForSequenceClassification

    _, model_cfg = tiny_hdvila
    import dataclasses as dc

    model = HdVilaForSequenceClassification(dc.replace(model_cfg, score_agg_func="mean"), 5)
    rng = np.random.default_rng(3)
    grid = jnp.asarray(rng.normal(size=(2, 2, 1, 2, 4, 64)).astype(np.float32))
    ids = jnp.asarray(rng.integers(2, 1000, size=(2, 8)))
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), grid, ids, mask)

    both = np.asarray(model.apply(params, grid, ids, mask)["logits"])
    c0 = np.asarray(model.apply(params, grid[:, :1], ids, mask)["logits"])
    c1 = np.asarray(model.apply(params, grid[:, 1:], ids, mask)["logits"])
    np.testing.assert_allclose(both, (c0 + c1) / 2, rtol=2e-5, atol=2e-5)
    assert np.abs(both - c0).max() > 1e-4  # aggregation actually changes scores

    # lse pooling on logits (not features)
    model_lse = HdVilaForSequenceClassification(dc.replace(model_cfg, score_agg_func="lse"), 5)
    lse = np.asarray(model_lse.apply(params, grid, ids, mask)["logits"])
    np.testing.assert_allclose(lse, np.logaddexp(c0, c1), rtol=2e-5, atol=2e-5)


def test_encoder_remat_matches_no_remat():
    """remat=True (the reference's ``with_cp`` analogue,
    ``resnet_mmdetection.py:182-183``) must not change the param tree, the
    loss, or the gradients — only activation residency."""
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoder, HdVilaEncoderConfig

    rng = np.random.default_rng(0)
    mid = jnp.asarray(rng.normal(size=(1, 1, 3, 64, 128)).astype(np.float32))
    oth = jnp.asarray(rng.normal(size=(1, 1, 2, 3, 16, 32)).astype(np.float32))
    results = {}
    for remat in (False, True):
        model = HdVilaEncoder(HdVilaEncoderConfig.tiny(remat=remat))
        params = model.init(jax.random.PRNGKey(0), mid, oth)["params"]

        def loss_fn(p, model=model):
            return jnp.mean(jnp.square(model.apply({"params": p}, mid, oth)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        results[remat] = (jax.tree_util.tree_structure(params), float(loss), grads)
    assert results[False][0] == results[True][0]
    assert abs(results[False][1] - results[True][1]) < 1e-6
    flat = lambda t: jax.tree_util.tree_leaves(t)
    for a, b in zip(flat(results[False][2]), flat(results[True][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_s2d_stem_equivalence():
    """The space-to-depth stem is bit-reshuffled, not approximated: same
    ``conv1/kernel`` param, same output as the direct 7×7/s2 conv (fp32)."""
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.models.hd_vila.resnet import StemConv

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 46, 64, 3), jnp.float32)
    base = StemConv(8, s2d=False)
    s2d = StemConv(8, s2d=True)
    params = base.init(jax.random.PRNGKey(1), x)
    out_base = base.apply(params, x)
    out_s2d = s2d.apply(params, x)
    assert out_base.shape == out_s2d.shape == (2, 23, 32, 8)
    assert jnp.allclose(out_base, out_s2d, atol=1e-5), float(
        jnp.abs(out_base - out_s2d).max()
    )
