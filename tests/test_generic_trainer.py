"""GenericTrainer end-to-end with the LF-VILA stage-1 model on the CPU mesh."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from xpretrain_tpu.config import ConfigDict
from xpretrain_tpu.data.datasets_lfvila import LfVilaPretrainCollator, LfVilaPretrainDataset
from xpretrain_tpu.data.loader import BatchLoader, InfiniteIterator
from xpretrain_tpu.data.tokenization import HashTokenizer
from xpretrain_tpu.models.lf_vila.pretrain import LfVilaConfig, LfVilaPretrain
from xpretrain_tpu.optim import NO_DECAY_LFVILA
from xpretrain_tpu.train.generic_trainer import GenericTrainer


pytestmark = pytest.mark.slow

def test_lfvila_stage1_generic_training(tmp_path):
    model_cfg = LfVilaConfig.tiny(stage=1, sample_clip=4, sample_frame=8)
    model = LfVilaPretrain(model_cfg)
    tok = HashTokenizer(vocab_size=1000)
    ds = LfVilaPretrainDataset(
        [{} for _ in range(32)], None, sample_frame=8, sample_clip=4,
        input_hw=(96, 160), synthetic=True,
    )
    collate = LfVilaPretrainCollator(tok, max_sent_len=10, mlm=False)
    loader = InfiniteIterator(BatchLoader(ds, 8, collate, seed=0))

    sample = next(iter(loader))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["video_frames"][:1]),
        jnp.asarray(sample["text_ids"][:1]),
        jnp.asarray(sample["attention_mask"][:1]),
        mtc_rng=jax.random.PRNGKey(1),
    )["params"]

    def apply_fn(p, batch, rng):
        return model.apply(
            {"params": p},
            batch["video_frames"],
            batch["text_ids"],
            batch["attention_mask"],
            mtc_rng=rng,
            deterministic=False,
            rngs={"dropout": rng},
        )

    cfg = ConfigDict(
        num_train_steps=3, learning_rate=1e-3, decay="constant", warmup_ratio=0.0,
        weight_decay=0.0, output_dir=str(tmp_path), log_steps=1,
        valid_steps=100, save_steps=100, seed=0,
    )
    trainer = GenericTrainer(
        cfg, apply_fn, params, loader,
        metric_keys=("ct_global_loss", "ct_time_loss"),
        no_decay_patterns=NO_DECAY_LFVILA,
    )
    state = trainer.train()
    assert int(state.step) == 3
    # params moved and loss finite on a fresh batch
    out = apply_fn(state.params, {k: jnp.asarray(v) for k, v in sample.items()}, jax.random.PRNGKey(9))
    assert np.isfinite(float(out["loss"]))


def test_lfvila_generic_training_steps_per_call(tmp_path):
    """steps_per_call=2 with a non-divisible total exercises the stacked
    dispatch + remainder chunk in GenericTrainer."""
    model_cfg = LfVilaConfig.tiny(stage=1, sample_clip=4, sample_frame=8)
    model = LfVilaPretrain(model_cfg)
    tok = HashTokenizer(vocab_size=1000)
    ds = LfVilaPretrainDataset(
        [{} for _ in range(32)], None, sample_frame=8, sample_clip=4,
        input_hw=(96, 160), synthetic=True,
    )
    collate = LfVilaPretrainCollator(tok, max_sent_len=10, mlm=False)
    loader = InfiniteIterator(BatchLoader(ds, 8, collate, seed=0))

    sample = next(iter(loader))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["video_frames"][:1]),
        jnp.asarray(sample["text_ids"][:1]),
        jnp.asarray(sample["attention_mask"][:1]),
        mtc_rng=jax.random.PRNGKey(1),
    )["params"]

    def apply_fn(p, batch, rng):
        return model.apply(
            {"params": p},
            batch["video_frames"],
            batch["text_ids"],
            batch["attention_mask"],
            mtc_rng=rng,
            deterministic=False,
            rngs={"dropout": rng},
        )

    cfg = ConfigDict(
        num_train_steps=3, steps_per_call=2, learning_rate=1e-3, decay="constant",
        warmup_ratio=0.0, weight_decay=0.0, output_dir=str(tmp_path), log_steps=1,
        valid_steps=100, save_steps=2, seed=0,
    )
    trainer = GenericTrainer(cfg, apply_fn, params, loader, no_decay_patterns=NO_DECAY_LFVILA)
    state = trainer.train()
    assert int(state.step) == 3
    assert trainer.ckpt.latest_step() in (2, 3)
