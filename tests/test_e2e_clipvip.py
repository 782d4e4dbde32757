"""End-to-end slice: synthetic ingest -> CLIP-ViP -> SPMD train -> retrieval eval.

The round-1 'minimum end-to-end slice' of SURVEY.md §7.4: data, model,
collectives, optimizer, metrics, checkpoint/resume all exercised on the
8-device virtual mesh with a tiny model.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xpretrain_tpu.config import ConfigDict
from xpretrain_tpu.data.datasets import RetrievalCollator, SyntheticVideoTextDataset
from xpretrain_tpu.data.loader import BatchLoader, InfiniteIterator
from xpretrain_tpu.data.tokenization import HashTokenizer
from xpretrain_tpu.data.transforms import clip_transform
from xpretrain_tpu.models.clip_vip import (
    CLIPTextConfig,
    CLIPVipConfig,
    CLIPVisionConfig,
    VipConfig,
)
from xpretrain_tpu.train.trainer import ClipVipTrainer

IMG = 32


pytestmark = pytest.mark.slow

class TransformedSynthetic:
    def __init__(self, size, num_frames=2, seed=0):
        self.ds = SyntheticVideoTextDataset(size=size, num_frames=num_frames, image_size=IMG, seed=seed)

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        item = self.ds[i]
        item["video"] = clip_transform(item["frames"], IMG)
        return item


def tiny_model_cfg():
    return CLIPVipConfig(
        text=CLIPTextConfig(
            vocab_size=49408, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
        ),
        vision=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=IMG, patch_size=16,
        ),
        vip=VipConfig(temporal_size=2, add_cls_num=2),
        projection_dim=16,
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = tmp_path_factory.mktemp("xpt_e2e")
    tok = HashTokenizer()
    collate = RetrievalCollator(tok, max_txt_len=16)
    train_loader = InfiniteIterator(BatchLoader(TransformedSynthetic(64), 16, collate, seed=0))
    val_loader = BatchLoader(
        TransformedSynthetic(24, seed=7), 8, collate, shuffle=False, drop_last=False
    )
    cfg = ConfigDict(
        num_train_steps=6,
        learning_rate=1e-3,
        decay="constant",
        warmup_ratio=0.0,
        weight_decay=0.0,
        loss_name="NCELearnableTempLoss",
        output_dir=str(out),
        valid_steps=100,
        save_steps=3,
        log_steps=2,
        validate_at_start=False,
        seed=0,
    )
    trainer = ClipVipTrainer(cfg, train_loader, val_loader, val_valid_len=24, model_cfg=tiny_model_cfg())
    state = trainer.train()
    return trainer, state, cfg


def test_training_reduces_loss(trained):
    trainer, state, _ = trained
    assert int(state.step) == 6
    # loss on a fixed batch must beat the init loss after training
    import jax

    from xpretrain_tpu.ops.losses import nce_learnable_temp
    from xpretrain_tpu.parallel.mesh import shard_host_batch

    batch = next(iter(trainer.val_loader))
    batch = shard_host_batch(batch, trainer.mesh)
    out_trained = trainer.eval_step(state.params, batch)
    out_init = trainer.eval_step(trainer.init_params, batch)

    def loss_of(out):
        return float(
            nce_learnable_temp(out["vis_features"], out["text_features"], out["logit_scale"])
        )

    assert loss_of(out_trained) < loss_of(out_init)


def test_eval_report_complete(trained):
    trainer, state, _ = trained
    report = trainer.validate(state.params)
    assert {"t2v", "v2t", "t2v_dsl", "v2t_dsl", "perf"} <= set(report)
    assert 0 <= report["t2v"]["R1"] <= 100
    assert report["perf"]["clips_per_s"] > 0


def test_checkpoint_resume(trained, tmp_path):
    trainer, state, cfg = trained
    # a fresh trainer over the same output dir must restore step 6 and stop
    tok = HashTokenizer()
    collate = RetrievalCollator(tok, max_txt_len=16)
    train_loader = InfiniteIterator(BatchLoader(TransformedSynthetic(64), 16, collate, seed=0))
    t2 = ClipVipTrainer(cfg, train_loader, model_cfg=tiny_model_cfg())
    state2 = t2.train()  # restores at 6 == num_train_steps -> no extra steps
    assert int(state2.step) == 6
    a = np.asarray(state.params["logit_scale"])
    b = np.asarray(state2.params["logit_scale"])
    np.testing.assert_allclose(a, b)


def test_checkpoint_resume_adapts_fused_layout(trained):
    """ClipVipTrainer must adopt the checkpoint's optimizer-state layout
    when the configured --fused_adamw differs (the checkpoint in the shared
    output dir was written with the fused default; resume with fused off)."""
    trainer, state, cfg = trained
    tok = HashTokenizer()
    collate = RetrievalCollator(tok, max_txt_len=16)
    train_loader = InfiniteIterator(BatchLoader(TransformedSynthetic(64), 16, collate, seed=0))
    cfg3 = ConfigDict(fused_adamw=False, **{k: v for k, v in cfg.items()})
    t3 = ClipVipTrainer(cfg3, train_loader, model_cfg=tiny_model_cfg())
    state3 = t3.train()  # would fail at restore without the layout override
    assert int(state3.step) == 6
    np.testing.assert_allclose(
        np.asarray(state.params["logit_scale"]), np.asarray(state3.params["logit_scale"])
    )


def test_steps_per_call_trainer(tmp_path):
    """steps_per_call=2 drives the same loop surface: step count, periodic
    checkpoint, and a final state identical in shape to the k=1 path."""
    tok = HashTokenizer()
    collate = RetrievalCollator(tok, max_txt_len=16)
    train_loader = InfiniteIterator(BatchLoader(TransformedSynthetic(64), 16, collate, seed=0))
    cfg = ConfigDict(
        num_train_steps=5,  # not divisible by k: exercises the remainder chunk
        steps_per_call=2,
        learning_rate=1e-3,
        decay="constant",
        warmup_ratio=0.0,
        weight_decay=0.0,
        loss_name="NCELearnableTempLoss",
        output_dir=str(tmp_path),
        valid_steps=100,
        save_steps=4,
        log_steps=2,
        validate_at_start=False,
        seed=0,
    )
    trainer = ClipVipTrainer(cfg, train_loader, model_cfg=tiny_model_cfg())
    state = trainer.train()
    assert int(state.step) == 5
    assert trainer.ckpt.latest_step() in (4, 5)
