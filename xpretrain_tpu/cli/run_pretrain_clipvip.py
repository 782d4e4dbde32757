"""CLIP-ViP pretraining over HD-VILA-100M-style data.

The runner surface of ``CLIP-ViP/src/pretrain/run_pretrain.py:202-445``:
video-subtitle pairs plus the auxiliary image/caption branch, the
``NCELearnableTempLoss_vsc_fc`` default loss over the pjit-global batch,
MetaLoader multi-source mixing, periodic retrieval validation.

Usage:
    python -m xpretrain_tpu.cli.run_pretrain_clipvip \
        --config xpretrain_tpu/configs/presets/pretrain_vip_base_32.json
"""

from __future__ import annotations

import jax

from xpretrain_tpu.cli.run_retrieval_clipvip import (
    build_loaders,
    build_tokenizer_from_cfg,
    load_pretrained,
)
from xpretrain_tpu.cli.shared_args import build_shared_parser, parse_args
from xpretrain_tpu.data.datasets import PretrainCollator, SyntheticVideoTextDataset
from xpretrain_tpu.data.loader import BatchLoader, InfiniteIterator, MetaLoader
from xpretrain_tpu.data.transforms import clip_transform
from xpretrain_tpu.train.checkpoints import save_training_meta
from xpretrain_tpu.train.trainer import ClipVipTrainer, clip_vip_config_from
from xpretrain_tpu.utils.basic import save_json
from xpretrain_tpu.utils.logging import setup_logging


class _SyntheticPretrain:
    """Synthetic pretrain items incl. the image/caption auxiliary branch."""

    def __init__(self, size, num_frames, image_size, seed=0):
        self.ds = SyntheticVideoTextDataset(
            size, num_frames, image_size, seed, with_image_branch=True
        )
        self.image_size = image_size

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        item = self.ds[i]
        item["video"] = clip_transform(item["frames"], self.image_size)
        item["image"] = clip_transform(item["image"], self.image_size)
        return item


def main(argv=None):
    parser = build_shared_parser("CLIP-ViP pretraining")
    parser.add_argument("--train_ratio", type=int, nargs="*", default=[1])
    cfg = parse_args(parser, argv)
    if "loss_name" not in (cfg.get("config") and cfg or {}):
        cfg.setdefault("loss_name", "NCELearnableTempLoss_vsc_fc")
    setup_logging(cfg.output_dir, jax.process_index())
    save_training_meta(cfg.output_dir, cfg)

    tok = build_tokenizer_from_cfg(cfg)
    collate = PretrainCollator(tok, max_txt_len=int(cfg.get("max_txt_len", 70)))
    pi, pc = jax.process_index(), jax.process_count()
    if cfg.get("dummy_data"):
        ds = _SyntheticPretrain(2048, cfg.num_frm, cfg.crop_img_size, seed=cfg.seed)
        loader = InfiniteIterator(
            BatchLoader(ds, cfg.train_batch_size, collate, seed=cfg.seed,
                        process_index=pi, process_count=pc)
        )
        train_loader = MetaLoader({"synthetic": (loader, 1)}, seed=cfg.seed)
        val_loader, valid_len = None, None
    else:
        # real data path: pretrain annotations with subtitle/caption sources
        train_loader, val_loader, valid_len = build_loaders(cfg)

    trainer = ClipVipTrainer(
        cfg, train_loader, val_loader, valid_len, model_cfg=clip_vip_config_from(cfg)
    )
    load_pretrained(cfg, trainer)
    state = trainer.train()
    if val_loader is not None:
        report = trainer.validate(state.params)
        save_json(report, f"{cfg.output_dir}/final_report.json", pretty=True)


if __name__ == "__main__":
    main()
