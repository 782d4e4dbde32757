"""Shared CLI flag surface for all runners.

Mirrors the reference's ``SharedConfigs`` argparse block
(``CLIP-ViP/src/configs/config.py:33-254``) with the "explicit CLI flag wins
over --config JSON" merge semantics and 0/1->bool coercion; fp16/amp flags
become bf16 (documented deviation: TPU needs no loss scaler)."""

from __future__ import annotations

import argparse

from xpretrain_tpu.config import ConfigDict, parse_with_config


def build_shared_parser(desc: str = "xpretrain_tpu runner") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--config", type=str, default=None, help="JSON/YAML config path")
    p.add_argument("--debug", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output_dir", type=str, default="output")
    p.add_argument("--data_mount_dir", type=str, default="", help="re-root data paths here")

    # data
    p.add_argument("--train_annotation", type=str, default="")
    p.add_argument("--val_annotation", type=str, default="")
    p.add_argument("--video_root", type=str, default="")
    p.add_argument("--dummy_data", type=int, default=0, help="synthetic ingest path")
    p.add_argument("--num_frm", type=int, default=12)
    p.add_argument("--sample_rate", type=int, default=0)
    p.add_argument("--crop_img_size", type=int, default=224)
    p.add_argument("--max_txt_len", type=int, default=70)
    p.add_argument("--train_batch_size", type=int, default=32)
    p.add_argument("--val_batch_size", type=int, default=32)
    p.add_argument("--device_ingest", type=int, default=0,
                   help="upload raw uint8 frames; normalize folds into the patch gemm")
    p.add_argument("--tokenizer", type=str, default="hash", help="hash|clip_bpe|wordpiece")
    p.add_argument("--tokenizer_vocab", type=str, default="")
    p.add_argument("--tokenizer_merges", type=str, default="")

    # optimization
    p.add_argument("--learning_rate", type=float, default=5e-6)
    p.add_argument("--weight_decay", type=float, default=0.2)
    p.add_argument("--betas", type=float, nargs=2, default=[0.9, 0.98])
    p.add_argument("--decay", type=str, default="cosine",
                   choices=["linear", "cosine", "invsqrt", "constant", "multi_step"])
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    p.add_argument("--grad_norm", type=float, default=2.0)
    p.add_argument("--num_train_steps", type=int, default=1000)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--fused_adamw", type=int, default=1,
                   help="single-traversal grouped AdamW (flat opt state); set 0 to\n"
                        "restore the optax multi_transform state layout of older\n"
                        "checkpoints")
    p.add_argument("--moment_dtype", type=str, default="fp32", choices=["fp32", "bf16"],
                   help="Adam moment storage dtype (fused optimizer only). bf16\n"
                        "frees half the moment HBM (~1.8 GB at LF-VILA scale);\n"
                        "accumulation still runs in fp32. Keep consistent across\n"
                        "resume: the checkpointed state carries the dtype")
    p.add_argument("--param_dtype", type=str, default="fp32", choices=["fp32", "bf16"],
                   help="parameter STORAGE dtype for fwd/bwd (apex-O2 inverted:\n"
                        "bf16 stored params + fp32 master copies in the optimizer\n"
                        "state; halves param/grad HBM traffic in fwd/bwd). The\n"
                        "update itself runs in fp32 on the masters. Keep\n"
                        "consistent across resume: the checkpointed state layout\n"
                        "carries the master copies")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="optimizer steps fused into one dispatch via lax.scan "
                        "(amortizes host dispatch; see PERF.md)")
    p.add_argument("--lr_mul", type=float, default=1.0)
    p.add_argument("--lr_mul_prefix", type=str, default="")
    p.add_argument("--loss_name", type=str, default="NCELearnableTempLoss")
    p.add_argument("--if_gather", type=int, default=1,
                   help="global contrastive batch (always on under pjit; kept for config compat)")

    # freezing (stage-2 recipes, text-encoder freeze)
    p.add_argument("--freeze_text_model", type=int, default=0)
    p.add_argument("--freeze_text_proj", type=int, default=0)
    p.add_argument("--frozen_patterns", type=str, nargs="*", default=[])

    # precision / memory
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--gradient_checkpointing", type=int, default=0)
    p.add_argument(
        "--remat_policy", type=str, default="",
        help="selective-remat policy for checkpointed blocks, a "
        "jax.checkpoint_policies name (e.g. dots_saveable): keep matmul "
        "outputs resident in the backward pass, recompute only the "
        "elementwise pipeline. Consumed by the LF-VILA Swin3D path; '' = "
        "full remat",
    )
    p.add_argument("--zero2", type=int, default=1, help="shard optimizer state over the mesh")
    p.add_argument(
        "--zero3", type=int, default=0,
        help="ZeRO-3/FSDP: shard the params themselves (and their moments) "
        "over the data axis (parallel/fsdp.py); composes with --tp. Per-chip "
        "params+optimizer memory drops by the data-parallel degree, at the "
        "cost of a param all-gather per step",
    )
    p.add_argument("--async_checkpoint", type=int, default=0,
                   help="non-blocking orbax saves (next save surfaces prior errors)")
    p.add_argument(
        "--tp", type=int, default=1,
        help="tensor-parallel degree: >1 builds a (data, model) mesh with "
        "Megatron-layout param sharding (parallel/tensor_parallel.py)",
    )
    p.add_argument(
        "--cp", type=int, default=1,
        help="context-parallel degree (LF-VILA): >1 shards the Swin3D/HTWA "
        "temporal axis over the mesh's model axis; shares that axis with "
        "--tp (if both are given they must be equal)",
    )

    # cadence
    p.add_argument("--log_steps", type=int, default=20)
    p.add_argument("--valid_steps", type=int, default=500)
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--validate_at_start", type=int, default=1)
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler device trace over N steps into output_dir/profile")
    p.add_argument("--profile_start_step", type=int, default=3)

    # model
    p.add_argument("--clip_size", type=str, default="base_32",
                   choices=["base_32", "base_16", "large_14", "tiny"])
    p.add_argument("--clip_weights", type=str, default="",
                   help="path to a torch CLIP / CLIP-ViP checkpoint to convert")
    p.add_argument("--e2e_weights_path", type=str, default="")
    return p


def parse_args(parser: argparse.ArgumentParser, argv=None) -> ConfigDict:
    # Multi-host init must precede the first backend touch (jax.devices());
    # every runner funnels through here before building a mesh.
    from xpretrain_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    cfg = parse_with_config(parser, argv)
    if cfg.get("data_mount_dir"):
        # re-root data paths (the reference's blob_mount / data_mount,
        # ref CLIP-ViP/src/pretrain/run_pretrain.py:447-466)
        for key in ("train_annotation", "val_annotation", "video_root"):
            if cfg.get(key) and not str(cfg[key]).startswith("/"):
                cfg[key] = f"{cfg['data_mount_dir'].rstrip('/')}/{cfg[key]}"
    return cfg
