"""HD-VILA pretraining runner (stages 1 and 2).

The runner surface of ``hd-vila/src/pretrain/run_pretrain_stage1_group.py:220-495``
and ``run_pretrain_stage2_group.py``: hybrid high/low-res encoder + two-stage
BERT, ITC (stage 1) or MLM+ITM (stage 2); the reference's three independent
LR schedules over transformer/cnn/align param groups map to the lr-mul
grouping (``--lr_mul`` + ``--lr_mul_prefix cnn``) under one schedule, with
the sharded-annotation reload supported through ``ShardedAnnotations``.

Usage:
    python -m xpretrain_tpu.cli.run_pretrain_hdvila \
        --config xpretrain_tpu/configs/presets/hdvila_pretrain_stage1.json --dummy_data 1
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from xpretrain_tpu.cli.shared_args import build_shared_parser, parse_args
from xpretrain_tpu.data.datasets import FrameSource
from xpretrain_tpu.data.datasets_hdvila import HdVilaPretrainCollator, HdVilaPretrainDataset
from xpretrain_tpu.data.loader import BatchLoader, InfiniteIterator
from xpretrain_tpu.data.tokenization import build_model_tokenizer
from xpretrain_tpu.models.bert import BertConfig
from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoder, HdVilaEncoderConfig
from xpretrain_tpu.models.hd_vila.modeling import HdVilaForPreTraining, HdVilaModelConfig
from xpretrain_tpu.ops.losses import nce_loss
from xpretrain_tpu.train.checkpoints import save_training_meta
from xpretrain_tpu.train.generic_trainer import GenericTrainer
from xpretrain_tpu.utils.logging import setup_logging

import flax.linen as nn


class HdVilaPretrainModel(nn.Module):
    """Encoder + transformer + stage-1 ITC loss in one module
    (the ``HDVILA`` wrapper role, ref ``e2e_model.py:16-93``)."""

    enc_cfg: HdVilaEncoderConfig
    model_cfg: HdVilaModelConfig
    temp: float = 0.05

    def setup(self) -> None:
        self.encoder = HdVilaEncoder(self.enc_cfg)
        self.transformer = HdVilaForPreTraining(self.model_cfg)

    def __call__(
        self,
        img_middle,
        img_other,
        text_input_ids,
        text_input_mask,
        mlm_labels=None,
        itm_labels=None,
        sample_rng=None,
        deterministic: bool = True,
    ):
        grid = self.encoder(img_middle, img_other)
        out = self.transformer(
            grid,
            text_input_ids,
            text_input_mask,
            mlm_labels=mlm_labels,
            itm_labels=itm_labels,
            sample_rng=sample_rng,
            deterministic=deterministic,
        )
        if self.model_cfg.stage == 1:
            out["itc_loss"] = nce_loss(out["vis_features"], out["text_features"], self.temp)
            out["loss"] = out["itc_loss"]
        else:
            out["loss"] = out.get("mlm_loss", 0.0) + out.get("itm_loss", 0.0)
        return out

    def forward_video(self, img_middle, img_other):
        """Video tower alone: hybrid encoder grid -> ITC projection.

        The serving-export surface (``serving/artifact.py``) — same math as
        the video half of the stage-1 ``__call__``."""
        return self.transformer.project_visual(self.encoder(img_middle, img_other))

    def forward_text(self, text_input_ids, text_input_mask):
        """Text tower alone (stage-0 BERT -> pooled -> t_proj -> L2)."""
        return self.transformer.forward_text(text_input_ids, text_input_mask)


def hdvila_configs_from(cfg) -> tuple[HdVilaEncoderConfig, HdVilaModelConfig]:
    dtype = jnp.bfloat16 if cfg.get("bf16", True) else jnp.float32
    crop = tuple(cfg.get("crop_size", (640, 1024)))
    # trained pos-embed grid is fixed at (10, 16) = 640x1024/64 regardless of
    # crop (the model interpolates at other sizes, ref timesformer.py:486-511)
    ts_hw = tuple(cfg.get("timesformer_hw", (10, 16)))
    enc = HdVilaEncoderConfig(
        resnet_depth=int(cfg.get("resnet_depth", 50)),
        hidden_size=int(cfg.get("hidden_size", 1024)),
        timesformer_depth=int(cfg.get("timesformer_depth", 4)),
        timesformer_heads=int(cfg.get("timesformer_heads", 16)),
        timesformer_frames=int(cfg.get("num_frm", 7)),
        timesformer_hw=ts_hw,
        dtype=dtype,
        remat=bool(cfg.get("gradient_checkpointing", False)),
    )
    kind = cfg.get("bert", "large")
    if kind == "large":
        bert = BertConfig.bert_large(stage_bounds=(12,))
    elif kind == "base":
        bert = BertConfig.bert_base(stage_bounds=(6,))
    else:  # tiny debug
        bert = BertConfig(
            hidden_size=int(cfg.get("hidden_size", 64)),
            num_hidden_layers=4,
            num_attention_heads=4,
            intermediate_size=2 * int(cfg.get("hidden_size", 64)),
            vocab_size=int(cfg.get("vocab_size", 49408)),
            stage_bounds=(2,),
        )
    model = HdVilaModelConfig(
        bert=bert,
        stage=int(cfg.get("stage", 1)),
        pixel_random_sampling_size=int(cfg.get("pixel_random_sampling_size", 160)),
        temp=float(cfg.get("temp", 0.05)),
        score_agg_func=cfg.get("score_agg_func", "mean"),
        dtype=dtype,
    )
    return enc, model


def apply_stage2_batch_fallback(cfg, backend: str | None = None):
    """Auto-route stage-2 per-chip batches ≥ 16 through grad accumulation.

    The reference stage-2 recipe trains batch 16/GPU
    (``hd-vila/src/configs/pretrain_stage2.json``); on the current TPU
    toolchain that exact configuration reproducibly crashes the XLA compile
    helper (PERF.md "Stage-2 pretrain steps"; minimized repro in
    ``tools/repro_hdvila_b16_crash.py``), while microbatch 8 compiles and
    2×8 grad accumulation is trajectory-equivalent to b=16
    (``tests/test_grad_accum_equivalence.py``) and within 1.4% of b=8
    throughput (PERF_MEASURED.md hdvila_train_s2_accum). So instead of
    leaving the workaround as a documented flag, the runner applies it:
    stage-2 TPU runs with ``train_batch_size >= 16`` and no explicit
    ``gradient_accumulation_steps`` are split into microbatches of 8.
    ``--stage2_b16_fallback 0`` opts out (e.g. after a toolchain fix).

    Pure function of (cfg, backend) so the rewrite is unit-testable.
    """
    backend = backend or jax.default_backend()
    b = int(cfg.get("train_batch_size", 32))
    if (
        int(cfg.get("stage", 1)) == 2
        and backend == "tpu"
        and bool(cfg.get("stage2_b16_fallback", 1))
        and b >= 16
        and int(cfg.get("gradient_accumulation_steps", 1)) == 1
        and b % 8 == 0
    ):
        cfg["gradient_accumulation_steps"] = b // 8
        cfg["train_batch_size"] = 8
        from xpretrain_tpu.utils.logging import LOGGER

        LOGGER.warning(
            "stage-2 b=%d auto-fallback: %d microbatches of 8 with gradient "
            "accumulation (XLA compile-helper crash at b>=16; disable with "
            "--stage2_b16_fallback 0)", b, b // 8,
        )
    return cfg


def main(argv=None):
    parser = build_shared_parser("HD-VILA pretraining")
    parser.add_argument("--stage", type=int, default=1, choices=[1, 2])
    parser.add_argument("--train_n_clips", type=int, default=2)
    parser.add_argument("--use_mlm", type=int, default=1)
    parser.add_argument("--use_itm", type=int, default=1,
                        help="stage-2 ITM; the reference stage-2 recipe "
                             "disables it (pretrain_stage2.json use_itm: 0)")
    parser.add_argument("--stage2_b16_fallback", type=int, default=1,
                        help="auto grad-accum fallback for stage-2 per-chip "
                             "batches >= 16 (see apply_stage2_batch_fallback)")
    cfg = parse_args(parser, argv)
    cfg = apply_stage2_batch_fallback(cfg)
    setup_logging(cfg.output_dir, jax.process_index())
    save_training_meta(cfg.output_dir, cfg)

    enc_cfg, model_cfg = hdvila_configs_from(cfg)
    model = HdVilaPretrainModel(enc_cfg, model_cfg, temp=model_cfg.temp)
    tok = build_model_tokenizer(cfg.get("tokenizer", "hash"), model_cfg.bert.vocab_size)
    stage2 = model_cfg.stage == 2
    use_mlm = stage2 and bool(cfg.get("use_mlm", 1))
    use_itm = stage2 and bool(cfg.get("use_itm", 1))
    collate = HdVilaPretrainCollator(
        tok, max_txt_len=int(cfg.get("max_txt_len", 50)), mlm=use_mlm, itm=use_itm, seed=cfg.seed
    )
    pi, pc = jax.process_index(), jax.process_count()
    crop = tuple(cfg.get("crop_size", (640, 1024)))
    ds = HdVilaPretrainDataset(
        cfg.get("train_annotation") or None,
        FrameSource(cfg.video_root) if cfg.get("video_root") else None,
        train_n_clips=cfg.train_n_clips,
        num_frm=cfg.num_frm,
        sample_rate=cfg.sample_rate or 12,
        crop_hw=crop,
        seed=cfg.seed,
        synthetic_size=1024 if cfg.get("dummy_data") else 0,
    )
    loader = InfiniteIterator(
        BatchLoader(ds, cfg.train_batch_size, collate, seed=cfg.seed,
                    process_index=pi, process_count=pc)
    )
    sample = next(iter(loader))
    kwargs = {}
    if use_mlm:
        kwargs["mlm_labels"] = jnp.asarray(sample["mlm_labels"][:1])
    if use_itm:
        kwargs["itm_labels"] = jnp.asarray(sample["itm_labels"][:1])
    params = model.init(
        jax.random.PRNGKey(cfg.seed),
        jnp.asarray(sample["img_middle"][:1]),
        jnp.asarray(sample["img_other"][:1]),
        jnp.asarray(sample["text_input_ids"][:1]),
        jnp.asarray(sample["text_input_mask"][:1]),
        **kwargs,
    )["params"]
    if cfg.get("e2e_weights_path"):
        # stage-2 restores stage-1 e2e weights this way (ref
        # run_pretrain_stage2_group.py:138-144); converter is parity-tested
        from xpretrain_tpu.data.tokenization import warn_if_hash_with_weights
        from xpretrain_tpu.models.pretrained import load_hdvila_e2e

        warn_if_hash_with_weights(cfg.get("tokenizer", "hash"), cfg["e2e_weights_path"])
        params = load_hdvila_e2e(params, cfg["e2e_weights_path"])

    def apply_fn(p, batch, rng):
        extra = {}
        if use_mlm:
            extra["mlm_labels"] = batch["mlm_labels"]
        if use_itm:
            extra["itm_labels"] = batch["itm_labels"]
        if stage2:
            extra["sample_rng"] = rng
        return model.apply(
            {"params": p},
            batch["img_middle"],
            batch["img_other"],
            batch["text_input_ids"],
            batch["text_input_mask"],
            deterministic=False,
            rngs={"dropout": rng},
            **extra,
        )

    trainer = GenericTrainer(
        cfg, apply_fn, params, loader,
        metric_keys=("itc_loss", "mlm_loss", "itm_loss", "mlm_acc", "itm_acc"),
    )
    return trainer.train()


if __name__ == "__main__":
    main()
