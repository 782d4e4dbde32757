"""Numerical parity of the flax CLIP-ViP against PyTorch references.

Two oracles (SURVEY.md §4 test strategy, BASELINE.md ≤1e-3 target):

1. HF ``transformers.CLIPModel`` — our tower with ``add_cls_num=0``,
   no temporal embed, single frame reduces exactly to vanilla CLIP.
2. The reference ``CLIP_ViP.py`` module itself (loaded from
   ``/root/reference``, never copied) — full proxy attention on multi-frame
   video with converted random weights.

torch import is slow on this host, so everything heavy is session-scoped.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from xpretrain_tpu.models.clip_vip import (  # noqa: E402
    CLIPTextConfig,
    CLIPVipConfig,
    CLIPVisionConfig,
    CLIPViPModel,
    VipConfig,
)
from xpretrain_tpu.models.clip_vip.convert import (  # noqa: E402
    flax_to_torch_clip,
    torch_clip_to_flax,
)

TEXT_KW = dict(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    max_position_embeddings=24,
)
VISION_KW = dict(
    hidden_size=48,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    image_size=32,
    patch_size=16,
)
PROJ = 32


pytestmark = pytest.mark.slow

def _token_batch(rng, batch=3, seq=10):
    """Input ids whose argmax position is the final (EOT) token."""
    ids = rng.integers(1, 100, size=(batch, seq))
    lengths = rng.integers(4, seq, size=batch)
    mask = np.zeros_like(ids)
    for i, ln in enumerate(lengths):
        ids[i, ln:] = 0
        ids[i, ln - 1] = 127  # EOT = highest vocab id
        mask[i, :ln] = 1
    return ids.astype(np.int64), mask.astype(np.int64)


@pytest.fixture(scope="module")
def hf_clip():
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        text_config=dict(**TEXT_KW, eos_token_id=127),
        vision_config=VISION_KW,
        projection_dim=PROJ,
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    return model


def test_vanilla_parity_vs_hf(hf_clip):
    """add_cls_num=0 + single frame == vanilla CLIP, through converted weights."""
    cfg = CLIPVipConfig(
        text=CLIPTextConfig(**TEXT_KW),
        vision=CLIPVisionConfig(**VISION_KW),
        vip=VipConfig(add_cls_num=0, if_use_temporal_embed=False, temporal_size=1),
        projection_dim=PROJ,
    )
    model = CLIPViPModel(cfg)
    variables = torch_clip_to_flax(hf_clip.state_dict(), n_text_layers=2, n_vision_layers=2)

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 1, 3, 32, 32)).astype(np.float32)
    ids, mask = _token_batch(rng)

    with torch.no_grad():
        want = hf_clip(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixels[:, 0]),
        )
    got = model.apply(
        variables, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(got["text_features"]), want.text_embeds.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["vis_features"]), want.image_embeds.numpy(), atol=2e-5
    )


@pytest.fixture(scope="module")
def reference_vip():
    """Load the reference CLIP_ViP module straight from /root/reference."""
    path = "/root/reference/CLIP-ViP/src/modeling/CLIP_ViP.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_clip_vip", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_clip_vip"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_proxy_attention_parity_vs_reference(reference_vip):
    """Full multi-frame proxy attention vs the reference implementation."""
    from types import SimpleNamespace

    from transformers import CLIPConfig

    add_cls_num, temporal_size, frames = 3, 6, 4
    hf_cfg = CLIPConfig(
        text_config=dict(**TEXT_KW, eos_token_id=127),
        vision_config=VISION_KW,
        projection_dim=PROJ,
    )
    hf_cfg.vision_additional_config = SimpleNamespace(
        type="ViP",
        temporal_size=temporal_size,
        if_use_temporal_embed=1,
        add_cls_num=add_cls_num,
        logit_scale_init_value=4.60,
        keep_frame_cls=0,
    )
    torch.manual_seed(1)
    ref = reference_vip.CLIPModel(hf_cfg).eval()
    with torch.no_grad():
        # make the zero-init temporal embedding non-trivial for a real test
        ref.vision_model.embeddings.temporal_embedding.normal_(0, 0.02)

    cfg = CLIPVipConfig(
        text=CLIPTextConfig(**TEXT_KW),
        vision=CLIPVisionConfig(**VISION_KW),
        vip=VipConfig(add_cls_num=add_cls_num, temporal_size=temporal_size),
        projection_dim=PROJ,
    )
    model = CLIPViPModel(cfg)
    variables = torch_clip_to_flax(ref.state_dict(), n_text_layers=2, n_vision_layers=2)

    rng = np.random.default_rng(1)
    video = rng.normal(size=(2, frames, 3, 32, 32)).astype(np.float32)
    ids, mask = _token_batch(rng)

    with torch.no_grad():
        want = ref(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(video),
        )
    got = model.apply(variables, jnp.asarray(video), jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(got["text_features"]), want.text_embeds.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["vis_features"]), want.image_embeds.numpy(), atol=2e-5
    )


def test_temporal_interpolation_parity_vs_reference(reference_vip):
    """T != temporal_size exercises the linear-interp path on both sides."""
    from types import SimpleNamespace

    from transformers import CLIPConfig

    hf_cfg = CLIPConfig(
        text_config=dict(**TEXT_KW, eos_token_id=127),
        vision_config=VISION_KW,
        projection_dim=PROJ,
    )
    hf_cfg.vision_additional_config = SimpleNamespace(
        type="ViP", temporal_size=6, if_use_temporal_embed=1, add_cls_num=2,
        logit_scale_init_value=4.60,
    )
    torch.manual_seed(2)
    ref = reference_vip.CLIPModel(hf_cfg).eval()
    with torch.no_grad():
        ref.vision_model.embeddings.temporal_embedding.normal_(0, 0.02)

    cfg = CLIPVipConfig(
        text=CLIPTextConfig(**TEXT_KW),
        vision=CLIPVisionConfig(**VISION_KW),
        vip=VipConfig(add_cls_num=2, temporal_size=6),
        projection_dim=PROJ,
    )
    model = CLIPViPModel(cfg)
    variables = torch_clip_to_flax(ref.state_dict(), n_text_layers=2, n_vision_layers=2)
    rng = np.random.default_rng(3)
    video = rng.normal(size=(1, 9, 3, 32, 32)).astype(np.float32)  # 9 != 6
    with torch.no_grad():
        want = ref.get_image_features(pixel_values=torch.tensor(video)).numpy()
    got = np.asarray(
        model.apply(variables, jnp.asarray(video), method=CLIPViPModel.encode_video)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_attention_modes_identical():
    """masked_full and factorized proxy attention must agree exactly."""
    import jax

    cfg_kwargs = dict(
        text=CLIPTextConfig(**TEXT_KW),
        vision=CLIPVisionConfig(**VISION_KW),
        projection_dim=PROJ,
    )
    m_masked = CLIPViPModel(
        CLIPVipConfig(vip=VipConfig(add_cls_num=3, temporal_size=4, attention_mode="masked_full"), **cfg_kwargs)
    )
    m_fact = CLIPViPModel(
        CLIPVipConfig(vip=VipConfig(add_cls_num=3, temporal_size=4, attention_mode="factorized"), **cfg_kwargs)
    )
    rng = np.random.default_rng(9)
    video = jnp.asarray(rng.normal(size=(2, 4, 3, 32, 32)).astype(np.float32))
    ids, mask = _token_batch(rng)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    params = m_masked.init(jax.random.PRNGKey(0), video, ids, mask)
    out_m = m_masked.apply(params, video, ids, mask)
    out_f = m_fact.apply(params, video, ids, mask)
    np.testing.assert_allclose(
        np.asarray(out_m["vis_features"]), np.asarray(out_f["vis_features"]), atol=1e-5
    )


def test_roundtrip_export(hf_clip):
    variables = torch_clip_to_flax(hf_clip.state_dict(), 2, 2)
    exported = flax_to_torch_clip(variables)
    sd = {k: v for k, v in hf_clip.state_dict().items() if "position_ids" not in k}
    assert set(exported) == set(sd)
    for key in sd:
        np.testing.assert_allclose(exported[key], sd[key].numpy(), atol=1e-6)


def test_released_checkpoint_file_format(reference_vip, tmp_path):
    """Byte-identical-format synthetic released checkpoint: a VidCLIP
    state_dict ('clipmodel.'-prefixed reference CLIP_ViP keys) torch.saved
    to disk, loaded via load_torch_checkpoint, converted, and forwarded —
    the path a user of tools/fetch_checkpoints.py takes with the real
    pretrain_clipvip_base_32.pt (zero-egress sandbox: documented blocker in
    that script; the file format here matches load_state_dict_with_mismatch
    consumption, ref CLIP-ViP/src/utils/load_save.py:86-104)."""
    from types import SimpleNamespace

    from transformers import CLIPConfig

    from xpretrain_tpu.models.clip_vip.convert import load_torch_checkpoint

    add_cls_num, temporal_size, frames = 3, 6, 4
    hf_cfg = CLIPConfig(
        text_config=dict(**TEXT_KW, eos_token_id=127),
        vision_config=VISION_KW,
        projection_dim=PROJ,
    )
    hf_cfg.vision_additional_config = SimpleNamespace(
        type="ViP", temporal_size=temporal_size, if_use_temporal_embed=1,
        add_cls_num=add_cls_num, logit_scale_init_value=4.60, keep_frame_cls=0,
    )
    torch.manual_seed(7)
    ref = reference_vip.CLIPModel(hf_cfg).eval()
    with torch.no_grad():
        ref.vision_model.embeddings.temporal_embedding.normal_(0, 0.02)

    # the released file layout: VidCLIP wrapper prefix, raw state_dict
    released = {f"clipmodel.{k}": v for k, v in ref.state_dict().items()}
    ckpt = tmp_path / "pretrain_clipvip_tiny.pt"
    torch.save(released, str(ckpt))

    sd = load_torch_checkpoint(str(ckpt))
    assert not any(k.startswith("clipmodel.") for k in sd), "prefix not stripped"
    variables = torch_clip_to_flax(sd, n_text_layers=2, n_vision_layers=2)

    cfg = CLIPVipConfig(
        text=CLIPTextConfig(**TEXT_KW),
        vision=CLIPVisionConfig(**VISION_KW),
        vip=VipConfig(add_cls_num=add_cls_num, temporal_size=temporal_size),
        projection_dim=PROJ,
    )
    model = CLIPViPModel(cfg)
    rng = np.random.default_rng(7)
    video = rng.normal(size=(2, frames, 3, 32, 32)).astype(np.float32)
    ids, mask = _token_batch(rng, batch=2, seq=10)
    with torch.no_grad():
        want = ref(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(video),
        )
    got = model.apply(variables, jnp.asarray(video), jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(got["text_features"]), want.text_embeds.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["vis_features"]), want.image_embeds.numpy(), atol=2e-5
    )
