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


def _swin2d_state_dict(rng, embed_dim=32, depths=(1, 1, 4, 1), heads=(2, 2, 4, 4),
                       window=7, patch=4):
    """Synthetic ImageNet-Swin-shaped 2-D state dict (4 stages, torch keys)."""
    import torch

    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32))

    sd = {
        "patch_embed.proj.weight": t(embed_dim, 3, patch, patch),
        "patch_embed.proj.bias": t(embed_dim),
        "norm.weight": t(embed_dim * 2 ** (len(depths) - 1)),
        "norm.bias": t(embed_dim * 2 ** (len(depths) - 1)),
    }
    side = 2 * window - 1
    for i, (d, h) in enumerate(zip(depths, heads)):
        c = embed_dim * 2**i
        for b in range(d):
            p = f"layers.{i}.blocks.{b}."
            sd[p + "norm1.weight"] = t(c)
            sd[p + "norm1.bias"] = t(c)
            sd[p + "attn.qkv.weight"] = t(3 * c, c)
            sd[p + "attn.qkv.bias"] = t(3 * c)
            sd[p + "attn.proj.weight"] = t(c, c)
            sd[p + "attn.proj.bias"] = t(c)
            sd[p + "attn.relative_position_bias_table"] = t(side * side, h)
            sd[p + "attn.relative_position_index"] = torch.zeros(
                window * window, window * window, dtype=torch.long
            )
            sd[p + "norm2.weight"] = t(c)
            sd[p + "norm2.bias"] = t(c)
            sd[p + "mlp.fc1.weight"] = t(4 * c, c)
            sd[p + "mlp.fc1.bias"] = t(4 * c)
            sd[p + "mlp.fc2.weight"] = t(c, 4 * c)
            sd[p + "mlp.fc2.bias"] = t(c)
        if i < len(depths) - 1:  # 2-D Swin downsamples after stages 0..2
            sd[f"layers.{i}.downsample.reduction.weight"] = t(2 * c, 4 * c)
            sd[f"layers.{i}.downsample.norm.weight"] = t(4 * c)
            sd[f"layers.{i}.downsample.norm.bias"] = t(4 * c)
    return sd


def test_lfvila_cascade_2d_inflation_per_stage(tmp_path):
    """pretrained_2d=1: a 4-stage 2-D Swin checkpoint inflates onto the
    6-stage HTWA layout with PER-STAGE temporal windows (ref
    ``load.py:199-238`` reads ``model.window_size[i_layer]``) and
    positional (stage, block) remapping (ref ``load.py:111-147``).

    Regression for the r3 review finding: a single last-stage window drove
    the inflation, so 5 of 6 stages' bias tables shape-mismatched and
    silently kept their random init.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from xpretrain_tpu.models.lf_vila.convert import _resize_bias_table_spatial
    from xpretrain_tpu.models.lf_vila.swin3d import Swin3DConfig, SwinTransformer3D
    from xpretrain_tpu.models.pretrained import load_lfvila_cascade

    cfg = Swin3DConfig.tiny()  # depths (1,1,2,1,1,1), heads (2,2,4,4,4,4)
    model = SwinTransformer3D(cfg)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(1, 3, 8, 96, 160)).astype(np.float32))
    fresh = {"video_encoder": model.init(jax.random.PRNGKey(3), video)["params"]}

    sd2d = _swin2d_state_dict(rng)
    path = tmp_path / "swin2d.pth"
    torch.save({"model": sd2d}, str(path))

    merged = load_lfvila_cascade(
        fresh, swin_weight=str(path), pretrained_2d=True, swin_config=cfg
    )["video_encoder"]

    # 2-D (stage, block) sequence folds positionally onto the 6-stage layout:
    # s0b0,s1b0,s2b0,s2b1,s2b2,s2b3,s3b0 -> s0b0,s1b0,s2b0,s2b1,s3b0,s4b0,s5b0
    block_map = {
        "layers_0_blocks_0": "layers.0.blocks.0.",
        "layers_1_blocks_0": "layers.1.blocks.0.",
        "layers_2_blocks_0": "layers.2.blocks.0.",
        "layers_2_blocks_1": "layers.2.blocks.1.",
        "layers_3_blocks_0": "layers.2.blocks.2.",
        "layers_4_blocks_0": "layers.2.blocks.3.",
        "layers_5_blocks_0": "layers.3.blocks.0.",
    }
    stage_of = lambda name: int(name.split("_")[1])
    for flax_name, torch_prefix in block_map.items():
        # qkv kernel proves the positional remap (transposed torch weight)
        np.testing.assert_allclose(
            np.asarray(merged[flax_name]["attn"]["qkv"]["kernel"]),
            sd2d[torch_prefix + "attn.qkv.weight"].numpy().T,
            atol=1e-6, err_msg=flax_name,
        )
        # bias table: spatial resize to this STAGE's (wh, ww) then (2wd-1)x tile
        wd, wh, ww = cfg.window_size[stage_of(flax_name)]
        table = _resize_bias_table_spatial(
            sd2d[torch_prefix + "attn.relative_position_bias_table"].numpy(), wh, ww
        )
        expect = np.tile(
            table.reshape(1, (2 * wh - 1) * (2 * ww - 1), -1), (2 * wd - 1, 1, 1)
        ).reshape(-1, table.shape[-1])
        got = np.asarray(merged[flax_name]["attn"]["relative_position_bias_table"])
        assert got.shape == expect.shape, flax_name
        np.testing.assert_allclose(got, expect, atol=1e-6, err_msg=flax_name)
        assert not np.allclose(
            got, np.asarray(fresh["video_encoder"][flax_name]["attn"]["relative_position_bias_table"])
        ), f"{flax_name} bias table kept init"

    # downsamples map positionally onto stages (0, 1, 4)
    for flax_name, torch_prefix in (
        ("layers_0_downsample", "layers.0.downsample."),
        ("layers_1_downsample", "layers.1.downsample."),
        ("layers_4_downsample", "layers.2.downsample."),
    ):
        np.testing.assert_allclose(
            np.asarray(merged[flax_name]["reduction"]["kernel"]),
            sd2d[torch_prefix + "reduction.weight"].numpy().T,
            atol=1e-6, err_msg=flax_name,
        )

    # patch embed: 4x4 kernel tiled 2x2 spatially (and kd=1 temporally), /4
    w2d = sd2d["patch_embed.proj.weight"].numpy()
    expect_kernel = np.tile(w2d[:, :, None], (1, 1, 1, 2, 2)).transpose(2, 3, 4, 1, 0) / 4.0
    np.testing.assert_allclose(
        np.asarray(merged["patch_embed"]["proj"]["kernel"]), expect_kernel, atol=1e-6
    )


def test_hdvila_e2e_routes_projections_into_rerank_head(hdvila_tiny, tmp_path):
    """The rerank head scores eval retrieval with head.t_proj/head.v_proj
    (``modeling.py:409-410``) — loading pretrain e2e weights must land the
    checkpoint's trained projections there, not leave them at random init
    (r3 review finding: only bert_model was routed)."""
    import jax
    import jax.numpy as jnp
    import torch

    from xpretrain_tpu.cli.run_retrieval_hdvila import HdVilaRerankModel
    from xpretrain_tpu.models.export import hdvila_e2e_flax_to_torch
    from xpretrain_tpu.models.pretrained import load_hdvila_e2e

    enc_cfg, model_cfg, init = hdvila_tiny
    src = init(1234)
    sd = hdvila_e2e_flax_to_torch(src)
    path = tmp_path / "hdvila_e2e.pt"
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, str(path))

    rerank = HdVilaRerankModel(enc_cfg, model_cfg, num_negs=1)
    rng = np.random.default_rng(3)
    params = rerank.init(
        jax.random.PRNGKey(5),
        jnp.asarray(rng.integers(0, 255, (2, 1, 3, 128, 256)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 255, (2, 1, 2, 3, 32, 64)).astype(np.float32)),
        jnp.asarray(rng.integers(2, 1000, (2, 8)).astype(np.int32)),
        jnp.ones((2, 8), jnp.int32),
    )["params"]
    merged = load_hdvila_e2e(params, str(path))
    for proj in ("t_proj", "v_proj"):
        np.testing.assert_allclose(
            np.asarray(merged["head"][proj]["kernel"]),
            np.asarray(src["transformer"][proj]["kernel"]),
            atol=1e-6, err_msg=proj,
        )
