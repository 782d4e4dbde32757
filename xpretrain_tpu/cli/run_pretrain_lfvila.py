"""LF-VILA pretraining runner (stages 1 and 2).

The runner surface of ``LF-VILA/src/run_pretrain.py:21-121`` +
``src/tools/trainer_pretrain.py``: YAML config, the two-stage model, MTC +
global InfoNCE (stage 1) or MLM+VTM (stage 2), DeepSpeed ZeRO-2 replaced by
pjit-sharded optimizer state.

Usage:
    python -m xpretrain_tpu.cli.run_pretrain_lfvila \
        --config xpretrain_tpu/configs/presets/lfvila_pretrain_stage1.yaml \
        --dummy_data 1
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from xpretrain_tpu.cli.shared_args import build_shared_parser, parse_args
from xpretrain_tpu.data.datasets import FrameSource
from xpretrain_tpu.data.datasets_lfvila import LfVilaPretrainCollator, LfVilaPretrainDataset
from xpretrain_tpu.data.loader import BatchLoader, InfiniteIterator
from xpretrain_tpu.data.tokenization import build_model_tokenizer
from xpretrain_tpu.models.bert import BertConfig
from xpretrain_tpu.models.lf_vila.pretrain import LfVilaConfig, LfVilaPretrain
from xpretrain_tpu.models.lf_vila.swin3d import Swin3DConfig
from xpretrain_tpu.optim import NO_DECAY_LFVILA
from xpretrain_tpu.parallel.mesh import MODEL_AXIS
from xpretrain_tpu.train.checkpoints import save_training_meta
from xpretrain_tpu.train.generic_trainer import GenericTrainer
from xpretrain_tpu.utils.basic import load_jsonl
from xpretrain_tpu.utils.logging import setup_logging


def lfvila_config_from(cfg) -> LfVilaConfig:
    ve = cfg.get("video_encoder", {})
    # --cp N: shard the HTWA temporal axis over the mesh's model axis
    # (mesh_from_config builds the 2-D mesh; GenericTrainer traces the step
    # under the ambient mesh so the constraint resolves)
    cp = int(cfg.get("cp", 1) or 1)
    video = Swin3DConfig(
        context_parallel_axis=MODEL_AXIS if cp > 1 else None,
        patch_size=tuple(ve.get("patch_size", (1, 8, 8))),
        embed_dim=int(ve.get("embed_dim", 128)),
        depths=tuple(ve.get("depths", (2, 2, 14, 2, 2, 2))),
        num_heads=tuple(ve.get("num_heads", (4, 8, 16, 16, 16, 32))),
        stages=tuple(ve.get("stages", (0, 1, 2, 2, 2, 3))),
        downsample_stages=tuple(ve.get("downsample_stages", (0, 1, 4))),
        window_size=tuple(tuple(w) for w in ve.get(
            "window_size", ((2, 3, 5), (4, 3, 5), (8, 3, 5), (16, 3, 5), (16, 3, 5), (32, 3, 5)))),
        local_window=int(ve.get("local_window", 4)),
        temporal_no_shifting=bool(ve.get("temporal_no_shifting", True)),
        dtype=jnp.bfloat16 if cfg.get("bf16", True) else jnp.float32,
        remat=bool(cfg.get("gradient_checkpointing", False)),
        remat_policy=cfg.get("remat_policy") or None,
        # lane-aligned grouped window attention (numerically equivalent,
        # +12.8% measured on the stage-1 step — PERF_MEASURED.md); config
        # key "group_windows": 0 restores the ungrouped layout
        group_windows=bool(ve.get("group_windows", True)),
    )
    bert_kw = dict(
        stage_bounds=(int(cfg.get("num_local_layers", 8)), int(cfg.get("stage1_layers", 12))),
        type_vocab_size=int(cfg.get("type_vocab_size", 8)),
        attention_window=int(cfg.get("attention_window", 0)),
    )
    kind = cfg.get("bert", "large")
    if kind == "large":
        bert = BertConfig.bert_large(**bert_kw)
    elif kind == "base":
        bert = BertConfig.bert_base(**bert_kw)
    else:  # tiny debug: hidden must match the Swin num_features for fusion
        hidden = int(video.embed_dim * 2 ** video.stages[-1])
        bert = BertConfig(
            hidden_size=hidden,
            num_hidden_layers=6,
            num_attention_heads=4,
            intermediate_size=2 * hidden,
            vocab_size=49408,
            **bert_kw,
        )
    tr = cfg.get("training", {})
    return LfVilaConfig(
        video=video,
        bert=bert,
        stage=int(cfg.get("stage", 1)),
        sample_clip=int(cfg.get("sample_clip", 4)),
        sample_frame=int(cfg.get("sample_frame", 32)),
        final_num_patches=int(cfg.get("final_num_patches", 6)),
        temp=float(tr.get("temp", 0.05)),
        time_temp=float(tr.get("time_temp", 0.05)),
        num_key=int(tr.get("num_key", 2)),
        num_value=int(tr.get("num_value", 2)),
        num_other_neg=int(tr.get("num_other_neg", 3)),
        use_time_match=bool(tr.get("use_time_match", True)),
        ct_global_loss_weight=float(tr.get("ct_global_loss_weight", 1.0)),
        ct_time_loss_weight=float(tr.get("ct_time_loss_weight", 1.0)),
        mlm_loss_weight=float(cfg.get("mlm_loss_weight", 1.0)),
        vtm_loss_weight=float(cfg.get("vtm_loss_weight", 10.0)),
        dtype=jnp.bfloat16 if cfg.get("bf16", True) else jnp.float32,
    )


def main(argv=None):
    parser = build_shared_parser("LF-VILA pretraining")
    parser.add_argument("--stage", type=int, default=1, choices=[1, 2])
    parser.add_argument("--sample_frame", type=int, default=32)
    parser.add_argument("--sample_clip", type=int, default=4)
    parser.add_argument("--input_hw", type=int, nargs=2, default=[192, 320])
    # the reference's WEIGHTS cascade (LF-VILA/src/run_pretrain.py:52-77)
    parser.add_argument("--model_weight", type=str, default="",
                        help="full LFVILA torch checkpoint (converted+merged)")
    parser.add_argument("--stage1_model_weight", type=str, default="")
    parser.add_argument("--swin_weight", type=str, default="",
                        help="Swin torch checkpoint; 2-D inflated when --pretrained_2d")
    parser.add_argument("--bert_weight", type=str, default="")
    parser.add_argument("--pretrained_2d", type=int, default=1)
    cfg = parse_args(parser, argv)
    setup_logging(cfg.output_dir, jax.process_index())
    save_training_meta(cfg.output_dir, cfg)

    model_cfg = lfvila_config_from(cfg)
    model = LfVilaPretrain(model_cfg)
    tok = build_model_tokenizer(cfg.get("tokenizer", "hash"), model_cfg.bert.vocab_size)
    mlm = model_cfg.stage == 2
    collate = LfVilaPretrainCollator(tok, max_sent_len=int(cfg.get("max_txt_len", 50)), mlm=mlm)
    pi, pc = jax.process_index(), jax.process_count()
    # uint8 device-ingest (config key "device_ingest": 0 disables): the host
    # ships raw [N,H,W,3] frames; PatchEmbed3D normalizes on device (fused
    # into the patchify conv). 4x less collate/H2D bytes — PERF.md
    # packed-feed section.
    device_ingest = bool(cfg.get("device_ingest", 1))
    if cfg.get("dummy_data"):
        ds = LfVilaPretrainDataset(
            [{} for _ in range(1024)], None, cfg.sample_frame, cfg.sample_clip,
            tuple(cfg.input_hw), synthetic=True, seed=cfg.seed,
            device_ingest=device_ingest,
        )
    else:
        records = load_jsonl(cfg.train_annotation)
        ds = LfVilaPretrainDataset(
            records, FrameSource(cfg.video_root), cfg.sample_frame, cfg.sample_clip,
            tuple(cfg.input_hw), seed=cfg.seed, device_ingest=device_ingest,
        )
    loader = InfiniteIterator(
        BatchLoader(ds, cfg.train_batch_size, collate, seed=cfg.seed,
                    process_index=pi, process_count=pc)
    )
    sample = next(iter(loader))

    init_args = dict(
        mtc_rng=jax.random.PRNGKey(1) if model_cfg.stage == 1 else None,
        mlm_labels=jnp.asarray(sample["mlm_labels"][:1]) if mlm else None,
    )
    params = model.init(
        jax.random.PRNGKey(cfg.seed),
        jnp.asarray(sample["video_frames"][:1]),
        jnp.asarray(sample["text_ids"][:1]),
        jnp.asarray(sample["attention_mask"][:1]),
        **{k: v for k, v in init_args.items() if v is not None},
    )["params"]
    if any(cfg.get(k) for k in ("model_weight", "stage1_model_weight", "swin_weight", "bert_weight")):
        from xpretrain_tpu.data.tokenization import warn_if_hash_with_weights
        from xpretrain_tpu.models.pretrained import load_lfvila_cascade

        warn_if_hash_with_weights(
            cfg.get("tokenizer", "hash"),
            next(w for k in ("model_weight", "stage1_model_weight", "swin_weight", "bert_weight")
                 if (w := cfg.get(k))),
        )
        params = load_lfvila_cascade(
            params,
            model_weight=cfg.get("model_weight", ""),
            stage1_model_weight=cfg.get("stage1_model_weight", ""),
            swin_weight=cfg.get("swin_weight", ""),
            bert_weight=cfg.get("bert_weight", ""),
            pretrained_2d=bool(cfg.get("pretrained_2d", 1)),
            swin_config=model_cfg.video,
        )

    def apply_fn(p, batch, rng):
        kwargs = {}
        if model_cfg.stage == 1:
            kwargs["mtc_rng"] = rng
        if mlm:
            kwargs["mlm_labels"] = batch["mlm_labels"]
        return model.apply(
            {"params": p},
            batch["video_frames"],
            batch["text_ids"],
            batch["attention_mask"],
            deterministic=False,
            rngs={"dropout": rng},
            **kwargs,
        )

    trainer = GenericTrainer(
        cfg, apply_fn, params, loader,
        metric_keys=("ct_global_loss", "ct_time_loss", "mlm_loss", "vtm_loss", "mlm_acc", "vtm_acc"),
        no_decay_patterns=NO_DECAY_LFVILA,
    )
    return trainer.train()


if __name__ == "__main__":
    main()
