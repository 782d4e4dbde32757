"""Runner-side pretrained-weight loading (models/pretrained.py).

The reference exposes pretrained weights as config knobs — HD-VILA's
``e2e_weights_path`` (``run_pretrain_stage2_group.py:138-144``) and
LF-VILA's WEIGHTS cascade (``run_pretrain.py:52-77``). These tests
round-trip tiny models through the parity-tested flax→torch exporters into
released-format ``.pt`` files and back through the loaders, asserting the
weights land in the right submodules.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _tree_allclose(a, b, atol=1e-6):
    import jax

    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(
        np.allclose(np.asarray(x), np.asarray(y), atol=atol) for x, y in zip(la, lb)
    )


@pytest.fixture(scope="module")
def hdvila_tiny():
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.cli.run_pretrain_hdvila import HdVilaPretrainModel
    from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoderConfig
    from xpretrain_tpu.models.hd_vila.modeling import HdVilaModelConfig

    enc_cfg = HdVilaEncoderConfig.tiny(timesformer_frames=3, timesformer_hw=(2, 4))
    model_cfg = HdVilaModelConfig.tiny(stage=1)
    model = HdVilaPretrainModel(enc_cfg, model_cfg, temp=0.05)
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.integers(0, 255, (1, 1, 3, 128, 256)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 255, (1, 1, 2, 3, 32, 64)).astype(np.float32)),
        jnp.asarray(rng.integers(2, 1000, (1, 8)).astype(np.int32)),
        jnp.ones((1, 8), jnp.int32),
    )
    def init(seed):
        return model.init(jax.random.PRNGKey(seed), *args)["params"]
    return enc_cfg, model_cfg, init


def test_hdvila_e2e_load_roundtrip(hdvila_tiny, tmp_path):
    import torch

    from xpretrain_tpu.models.export import hdvila_e2e_flax_to_torch
    from xpretrain_tpu.models.pretrained import load_hdvila_e2e

    _, _, init = hdvila_tiny
    src = init(1234)
    sd = hdvila_e2e_flax_to_torch(src)
    path = tmp_path / "hdvila_e2e.pt"
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, str(path))

    fresh = init(7)
    assert not _tree_allclose(fresh, src)
    merged = load_hdvila_e2e(fresh, str(path))
    # every exported leaf must have replaced the fresh init
    np.testing.assert_allclose(
        np.asarray(merged["encoder"]["cnn"]["conv1"]["kernel"]),
        np.asarray(src["encoder"]["cnn"]["conv1"]["kernel"]), atol=1e-6,
    )
    bm, bs = merged["transformer"]["bert_model"], src["transformer"]["bert_model"]
    assert _tree_allclose(bm, bs)


def test_hdvila_e2e_routes_bert_into_task_head(hdvila_tiny, tmp_path):
    """Loading pretrain e2e weights into a QA model lands the staged BERT in
    head.bert_model while the classifier keeps its init."""
    import jax
    import jax.numpy as jnp
    import torch

    from xpretrain_tpu.cli.run_video_qa_hdvila import HdVilaQAModel
    from xpretrain_tpu.models.export import hdvila_e2e_flax_to_torch
    from xpretrain_tpu.models.pretrained import load_hdvila_e2e

    enc_cfg, model_cfg, init = hdvila_tiny
    src = init(1234)
    sd = hdvila_e2e_flax_to_torch(src)
    path = tmp_path / "hdvila_e2e.pt"
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, str(path))

    qa = HdVilaQAModel(enc_cfg, model_cfg, "msrvtt_qa", num_labels=5)
    rng = np.random.default_rng(3)
    qa_params = qa.init(
        jax.random.PRNGKey(5),
        jnp.asarray(rng.integers(0, 255, (1, 1, 3, 128, 256)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 255, (1, 1, 2, 3, 32, 64)).astype(np.float32)),
        jnp.asarray(rng.integers(2, 1000, (1, 8)).astype(np.int32)),
        jnp.ones((1, 8), jnp.int32),
    )["params"]
    before_cls = np.asarray(
        jax.tree_util.tree_leaves(qa_params["head"]["classifier"])[0]
    ).copy()
    merged = load_hdvila_e2e(qa_params, str(path))
    # every leaf present in the stage-1 source lands in head.bert_model
    # (the QA model traces both BERT stages, so it holds MORE params —
    # stage-2 layers, visual_embeddings, pooler2 — which keep their init)
    flat = lambda t: {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(t)[0]
    }
    got = flat(merged["head"]["bert_model"]["bert"])
    want = flat(src["transformer"]["bert_model"]["bert"])
    assert want and all(
        k in got and np.allclose(got[k], want[k], atol=1e-6) for k in want
    )
    np.testing.assert_allclose(  # task classifier untouched
        np.asarray(jax.tree_util.tree_leaves(merged["head"]["classifier"])[0]),
        before_cls,
    )
    np.testing.assert_allclose(
        np.asarray(merged["encoder"]["cnn"]["conv1"]["kernel"]),
        np.asarray(src["encoder"]["cnn"]["conv1"]["kernel"]), atol=1e-6,
    )


def test_lfvila_cascade_full_model(tmp_path):
    import jax
    import jax.numpy as jnp
    import torch

    from xpretrain_tpu.models.export import lfvila_flax_to_torch
    from xpretrain_tpu.models.lf_vila.pretrain import LfVilaConfig, LfVilaPretrain
    from xpretrain_tpu.models.pretrained import load_lfvila_cascade

    cfg = LfVilaConfig.tiny(stage=1, sample_clip=4, sample_frame=8)
    model = LfVilaPretrain(cfg)
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.normal(size=(1, 3, 8, 96, 160)).astype(np.float32)),
        jnp.asarray(rng.integers(2, 1000, (1, 4, 12)).astype(np.int32)),
        jnp.ones((1, 4, 12), jnp.int32),
    )
    src = model.init(jax.random.PRNGKey(1234), *args, mtc_rng=jax.random.PRNGKey(1))["params"]
    sd = lfvila_flax_to_torch(src)
    path = tmp_path / "lfvila_stage1.pt"
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, str(path))

    fresh = model.init(jax.random.PRNGKey(7), *args, mtc_rng=jax.random.PRNGKey(1))["params"]
    merged = load_lfvila_cascade(fresh, model_weight=str(path))
    assert _tree_allclose(merged["video_encoder"], src["video_encoder"], atol=1e-5)
    assert _tree_allclose(
        merged["text_encoder"]["embeddings"], src["text_encoder"]["embeddings"]
    )


def test_lfvila_cascade_swin_plus_bert(tmp_path):
    """The per-encoder branch: swin_weight (3-D, pretrained_2d=0) +
    bert_weight land in video_encoder / text_encoder respectively."""
    import jax
    import jax.numpy as jnp
    import torch

    from xpretrain_tpu.models.export import bert_flax_to_torch, swin3d_flax_to_torch
    from xpretrain_tpu.models.lf_vila.pretrain import LfVilaConfig, LfVilaPretrain
    from xpretrain_tpu.models.pretrained import load_lfvila_cascade

    cfg = LfVilaConfig.tiny(stage=1, sample_clip=4, sample_frame=8)
    model = LfVilaPretrain(cfg)
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.normal(size=(1, 3, 8, 96, 160)).astype(np.float32)),
        jnp.asarray(rng.integers(2, 1000, (1, 4, 12)).astype(np.int32)),
        jnp.ones((1, 4, 12), jnp.int32),
    )
    src = model.init(jax.random.PRNGKey(1234), *args, mtc_rng=jax.random.PRNGKey(1))["params"]

    swin_sd = swin3d_flax_to_torch(src["video_encoder"])
    te = dict(src["text_encoder"])
    pooler = te.pop("pooler", None)
    bert_sd = bert_flax_to_torch(te, pooler=pooler)
    p_swin, p_bert = tmp_path / "swin3d.pth", tmp_path / "bert.bin"
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in swin_sd.items()}, str(p_swin))
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in bert_sd.items()}, str(p_bert))

    fresh = model.init(jax.random.PRNGKey(7), *args, mtc_rng=jax.random.PRNGKey(1))["params"]
    merged = load_lfvila_cascade(
        fresh, swin_weight=str(p_swin), bert_weight=str(p_bert), pretrained_2d=False
    )
    assert _tree_allclose(merged["video_encoder"], src["video_encoder"], atol=1e-5)
    assert _tree_allclose(
        merged["text_encoder"]["embeddings"], src["text_encoder"]["embeddings"]
    )
    # the projections were NOT in either checkpoint: must keep the fresh init
    assert _tree_allclose(merged["video_global_proj"], fresh["video_global_proj"])
