"""CLIP-ViP retrieval: zero-shot eval, fine-tune, and inference.

The runner surface of ``CLIP-ViP/src/tasks/run_video_retrieval.py:205-434``:
``--mode eval`` is the minimum end-to-end slice (zero-shot MSR-VTT-style
retrieval), ``--mode train`` fine-tunes with the global-contrastive-batch
loss, best model tracked on t2v R@1.

Usage:
    python -m xpretrain_tpu.cli.run_retrieval_clipvip \
        --config xpretrain_tpu/configs/presets/msrvtt_retrieval_vip_base_32.json \
        --mode eval
"""

from __future__ import annotations

import jax

from xpretrain_tpu.cli.shared_args import build_shared_parser, parse_args
from xpretrain_tpu.data.datasets import (
    FrameSource,
    RetrievalCollator,
    SyntheticVideoTextDataset,
    VideoRetrievalDataset,
)
from xpretrain_tpu.data.loader import BatchLoader, InfiniteIterator, SequentialEvalLoader
from xpretrain_tpu.data.tokenization import build_tokenizer
from xpretrain_tpu.data.transforms import clip_transform
from xpretrain_tpu.train.checkpoints import save_training_meta
from xpretrain_tpu.train.trainer import ClipVipTrainer, clip_vip_config_from
from xpretrain_tpu.utils.basic import save_json
from xpretrain_tpu.utils.logging import LOGGER, setup_logging


class _TransformedSynthetic:
    def __init__(self, size, num_frames, image_size, seed=0, device_ingest=False):
        self.ds = SyntheticVideoTextDataset(size, num_frames, image_size, seed)
        self.device_ingest = device_ingest

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        from xpretrain_tpu.data.transforms import clip_resize_crop_u8

        item = self.ds[i]
        if self.device_ingest:
            item["video"] = clip_resize_crop_u8(item["frames"], self.ds.image_size)
        else:
            item["video"] = clip_transform(item["frames"], self.ds.image_size)
        return item


def build_tokenizer_from_cfg(cfg):
    kind = cfg.get("tokenizer", "hash")
    kwargs = {}
    if kind == "clip_bpe":
        kwargs = dict(vocab_path=cfg["tokenizer_vocab"], merges_path=cfg.get("tokenizer_merges") or None)
    elif kind == "wordpiece":
        kwargs = dict(vocab_path=cfg["tokenizer_vocab"])
    return build_tokenizer(kind, **kwargs)


def build_loaders(cfg):
    tok = build_tokenizer_from_cfg(cfg)
    collate = RetrievalCollator(tok, max_txt_len=int(cfg.get("max_txt_len", 70)))
    pi, pc = jax.process_index(), jax.process_count()
    ingest = bool(cfg.get("device_ingest"))
    if cfg.get("dummy_data"):
        train_ds = _TransformedSynthetic(
            512, cfg.num_frm, cfg.crop_img_size, seed=cfg.seed, device_ingest=ingest
        )
        val_ds = _TransformedSynthetic(
            128, cfg.num_frm, cfg.crop_img_size, seed=cfg.seed + 1, device_ingest=ingest
        )
    else:
        source = FrameSource(cfg.video_root)
        train_ds = VideoRetrievalDataset(
            cfg.train_annotation, source, cfg.num_frm, cfg.crop_img_size,
            train=True, seed=cfg.seed, device_ingest=ingest,
        ) if cfg.get("train_annotation") else None
        val_ds = VideoRetrievalDataset(
            cfg.val_annotation, source, cfg.num_frm, cfg.crop_img_size,
            train=False, device_ingest=ingest,
        )
    train_loader = (
        InfiniteIterator(
            BatchLoader(
                train_ds, cfg.train_batch_size, collate, seed=cfg.seed,
                process_index=pi, process_count=pc,
            )
        )
        if train_ds is not None
        else None
    )
    val_loader = SequentialEvalLoader(
        val_ds, cfg.val_batch_size, collate, process_index=pi, process_count=pc
    )
    return train_loader, val_loader, len(val_ds)


def load_pretrained(cfg, trainer):
    if not cfg.get("clip_weights") and not cfg.get("e2e_weights_path"):
        return
    from xpretrain_tpu.data.tokenization import warn_if_hash_with_weights

    warn_if_hash_with_weights(
        cfg.get("tokenizer", "hash"),
        cfg.get("e2e_weights_path") or cfg.get("clip_weights"),
        vocab_name="CLIP BPE",
        hint="--tokenizer clip_bpe --tokenizer_vocab <vocab.json> "
             "--tokenizer_merges <merges.txt>",
    )
    from xpretrain_tpu.models.clip_vip.convert import (
        load_torch_checkpoint,
        merge_pretrained,
        torch_clip_to_flax,
    )

    path = cfg.get("e2e_weights_path") or cfg.get("clip_weights")
    sd = load_torch_checkpoint(path)
    model_cfg = trainer.model.config
    converted = torch_clip_to_flax(
        sd,
        n_text_layers=model_cfg.text.num_hidden_layers,
        n_vision_layers=model_cfg.vision.num_hidden_layers,
        temporal_size=model_cfg.vip.temporal_size,
    )
    trainer.init_params = merge_pretrained({"params": trainer.init_params}, converted)["params"]
    LOGGER.info("loaded pretrained weights from %s", path)


def main(argv=None):
    parser = build_shared_parser("CLIP-ViP video retrieval")
    parser.add_argument("--mode", type=str, default="train", choices=["train", "eval"])
    parser.add_argument("--save_feats", type=str, default="",
                        help="dump gathered eval features (+ids) to this .npz (ref run_video_retrieval.py:233 save_feat)")
    cfg = parse_args(parser, argv)
    setup_logging(cfg.output_dir, jax.process_index())
    save_training_meta(cfg.output_dir, cfg)

    train_loader, val_loader, valid_len = build_loaders(cfg)
    trainer = ClipVipTrainer(
        cfg, train_loader or val_loader, val_loader, valid_len,
        model_cfg=clip_vip_config_from(cfg),
    )
    load_pretrained(cfg, trainer)

    feats_path = cfg.get("save_feats") or None
    if cfg.mode == "eval":
        report = trainer.validate(trainer.init_params, save_feats_path=feats_path)
        save_json(report, f"{cfg.output_dir}/eval_report.json", pretty=True)
        return report
    state = trainer.train()
    report = trainer.validate(state.params, save_feats_path=feats_path)
    save_json(report, f"{cfg.output_dir}/final_report.json", pretty=True)
    return report


if __name__ == "__main__":
    main()
