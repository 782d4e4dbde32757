"""HD-VILA video-text retrieval runner (dual-encoder ITC fine-tune + eval).

The runner surface of ``hd-vila/src/tasks/run_video_retrieval.py:168-434``:
the e2e hybrid encoder's stage-1 ITC features trained with the contrastive
loss zoo over the pjit-global batch; eval gathers features per batch and
computes R@K (raw + DSL).

``--loss_type rank`` trains the fusion rerank head
(:class:`HdVilaForVideoTextRetrieval`, ref ``modeling_stage.py:694-751``)
with the reference's margin triplet loss (``calc_loss`` ``:738-747``):
each video's fused score against its own caption is the positive and its
scores against ``--num_negs`` batch-rolled captions are the negatives,
``mean(relu(margin + neg - pos))`` over sigmoid scores. Retrieval eval in
rank mode uses the head's dual-encoder projections (``t_proj``/``v_proj``)
— full N×M fusion scoring is O(N·M) forwards and the reference never
drives its copy of the head either.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from xpretrain_tpu.cli.run_pretrain_hdvila import HdVilaPretrainModel, hdvila_configs_from
from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoder, HdVilaEncoderConfig
from xpretrain_tpu.models.hd_vila.modeling import (
    HdVilaForVideoTextRetrieval,
    HdVilaModelConfig,
)
from xpretrain_tpu.cli.shared_args import build_shared_parser, parse_args
from xpretrain_tpu.data.datasets import FrameSource
from xpretrain_tpu.data.datasets_hdvila import HdVilaPretrainCollator
from xpretrain_tpu.data.datasets_hdvila_tasks import HdVilaClipLoader, HdVilaRetrievalDataset
from xpretrain_tpu.data.loader import BatchLoader, InfiniteIterator, SequentialEvalLoader
from xpretrain_tpu.data.tokenization import build_model_tokenizer
from xpretrain_tpu.ops.losses import build_loss_fn
from xpretrain_tpu.parallel.mesh import shard_host_batch
from xpretrain_tpu.parallel.train_step import make_eval_step
from xpretrain_tpu.train.checkpoints import save_training_meta
from xpretrain_tpu.train.evaluate import evaluate_retrieval
from xpretrain_tpu.train.generic_trainer import GenericTrainer
from xpretrain_tpu.utils.basic import save_json
from xpretrain_tpu.utils.logging import setup_logging


class HdVilaRerankModel(nn.Module):
    """Encoder + fusion rerank head with in-batch rolled negatives.

    The margin triplet loss over sigmoid fusion scores follows the reference
    (``modeling_stage.py:738-747``): scores reshape to (video, 1+num_negs)
    with the positive in column 0. Negatives are batch rolls of the caption
    tensors (static shapes, no host-side negative sampling), the pjit
    analogue of the reference dataset's per-video negative captions.
    """

    enc_cfg: HdVilaEncoderConfig
    model_cfg: HdVilaModelConfig
    num_negs: int = 3
    margin: float = 0.2

    def setup(self) -> None:
        self.encoder = HdVilaEncoder(self.enc_cfg)
        self.head = HdVilaForVideoTextRetrieval(self.model_cfg)

    def __call__(
        self,
        img_middle,
        img_other,
        text_input_ids,
        text_input_mask,
        with_rank_loss: bool = False,
        deterministic: bool = True,
    ):
        grid = self.encoder(img_middle, img_other)
        if not with_rank_loss:
            return self.head(grid, text_input_ids, text_input_mask, deterministic=deterministic)
        k = self.num_negs
        B = text_input_ids.shape[0]
        if k >= B:
            # roll s with s % B == 0 would reproduce the positive pair — the
            # "negative" column then contributes a constant margin with zero
            # gradient and training silently does nothing
            raise ValueError(
                f"rank mode needs num_negs < batch size, got num_negs={k} "
                f"with batch {B} (every roll 1..num_negs must be a distinct "
                "non-identity permutation)"
            )
        # (1+k)·B pairs: video_i × [own caption, k rolled captions]; the
        # positive block 0 doubles as the eval output, so the fusion tower
        # runs ONCE over all pairs (no separate positive-only forward)
        ids = jnp.concatenate(
            [text_input_ids] + [jnp.roll(text_input_ids, s, axis=0) for s in range(1, k + 1)]
        )
        mask = jnp.concatenate(
            [text_input_mask] + [jnp.roll(text_input_mask, s, axis=0) for s in range(1, k + 1)]
        )
        grid_rep = jnp.tile(grid, (1 + k,) + (1,) * (grid.ndim - 1))
        pair = self.head(grid_rep, ids, mask, deterministic=deterministic)
        out = {name: pair[name][:B] for name in ("logits", "text_features", "vis_features")}
        scores = jax.nn.sigmoid(pair["logits"].astype(jnp.float32)).reshape(1 + k, -1).T
        pos, neg = scores[:, :1], scores[:, 1:]
        out["rank_loss"] = jnp.mean(jnp.maximum(self.margin + neg - pos, 0.0))
        out["loss"] = out["rank_loss"]
        return out


def main(argv=None):
    parser = build_shared_parser("HD-VILA video retrieval")
    parser.add_argument("--mode", type=str, default="train", choices=["train", "eval"])
    parser.add_argument("--train_n_clips", type=int, default=2)
    parser.add_argument(
        "--loss_type", type=str, default="itc", choices=["itc", "rank"],
        help="itc: dual-encoder contrastive fine-tune; rank: fusion rerank "
             "head with the reference's margin triplet loss",
    )
    parser.add_argument("--margin", type=float, default=0.2)
    parser.add_argument("--num_negs", type=int, default=3,
                        help="rank mode: in-batch rolled negatives per video")
    cfg = parse_args(parser, argv)
    cfg["stage"] = 1  # dual-encoder ITC
    setup_logging(cfg.output_dir, jax.process_index())
    save_training_meta(cfg.output_dir, cfg)

    enc_cfg, model_cfg = hdvila_configs_from(cfg)
    rank_mode = cfg.get("loss_type", "itc") == "rank"
    if rank_mode:
        model = HdVilaRerankModel(
            enc_cfg, model_cfg,
            num_negs=int(cfg.get("num_negs", 3)), margin=float(cfg.get("margin", 0.2)),
        )
    else:
        model = HdVilaPretrainModel(enc_cfg, model_cfg, temp=model_cfg.temp)
    tok = build_model_tokenizer(cfg.get("tokenizer", "hash"), model_cfg.bert.vocab_size)
    collate = HdVilaPretrainCollator(
        tok, max_txt_len=int(cfg.get("max_txt_len", 50)), mlm=False, itm=False
    )
    loader_args = dict(
        n_clips=cfg.train_n_clips, num_frm=cfg.num_frm, sample_rate=cfg.sample_rate or 12,
        crop_hw=tuple(cfg.get("crop_size", (640, 1024))),
    )
    pi, pc = jax.process_index(), jax.process_count()
    if cfg.get("dummy_data"):
        clip_loader = HdVilaClipLoader(None, synthetic_seed=cfg.seed, **loader_args)
        rows = [{"clip_id": f"c{i}", "text": f"video about topic {i}"} for i in range(128)]
        train_ds = HdVilaRetrievalDataset(None, clip_loader, rows=rows, train=True, seed=cfg.seed)
        val_ds = HdVilaRetrievalDataset(None, clip_loader, rows=rows[:64])
    else:
        clip_loader = HdVilaClipLoader(FrameSource(cfg.video_root), **loader_args)
        train_ds = HdVilaRetrievalDataset(cfg.train_annotation, clip_loader, train=True, seed=cfg.seed)
        val_ds = HdVilaRetrievalDataset(cfg.val_annotation, clip_loader)
    train_loader = InfiniteIterator(
        BatchLoader(train_ds, cfg.train_batch_size, collate, seed=cfg.seed,
                    process_index=pi, process_count=pc)
    )
    val_loader = SequentialEvalLoader(val_ds, cfg.val_batch_size, collate,
                                      process_index=pi, process_count=pc)

    sample = next(iter(train_loader))
    params = model.init(
        jax.random.PRNGKey(cfg.seed),
        jnp.asarray(sample["img_middle"][:1]),
        jnp.asarray(sample["img_other"][:1]),
        jnp.asarray(sample["text_input_ids"][:1]),
        jnp.asarray(sample["text_input_mask"][:1]),
    )["params"]
    if cfg.get("e2e_weights_path"):
        from xpretrain_tpu.data.tokenization import warn_if_hash_with_weights
        from xpretrain_tpu.models.pretrained import load_hdvila_e2e

        warn_if_hash_with_weights(cfg.get("tokenizer", "hash"), cfg["e2e_weights_path"])
        params = load_hdvila_e2e(params, cfg["e2e_weights_path"])

    loss_fn = build_loss_fn(cfg.get("loss_name", "NCEContrastiveLoss"), temp=model_cfg.temp) \
        if cfg.get("loss_name", "NCEContrastiveLoss") in ("NCEContrastiveLoss",) \
        else build_loss_fn(cfg["loss_name"])

    def apply_fn(p, batch, rng):
        kwargs = {"with_rank_loss": True} if rank_mode else {}
        out = model.apply(
            {"params": p},
            batch["img_middle"],
            batch["img_other"],
            batch["text_input_ids"],
            batch["text_input_mask"],
            deterministic=False,
            rngs={"dropout": rng},
            **kwargs,
        )
        if rank_mode:
            return out  # margin triplet loss computed in-model
        kind = getattr(loss_fn, "signature_kind", "pair_temp")
        if kind == "pair_temp":
            out["loss"] = loss_fn(out["vis_features"], out["text_features"])
        else:
            out["loss"] = loss_fn(
                out["vis_features"], out["text_features"], jnp.log(jnp.asarray(1.0 / model_cfg.temp))
            )
        return out

    from xpretrain_tpu.parallel.mesh import create_mesh

    eval_mesh = create_mesh()
    eval_step = make_eval_step(
        lambda p, b, r: model.apply(
            {"params": p}, b["img_middle"], b["img_other"],
            b["text_input_ids"], b["text_input_mask"],
        ),
        eval_mesh,
    )

    def run_eval(p):
        batches = (shard_host_batch(dict(b), eval_mesh) for b in val_loader)
        report = evaluate_retrieval(eval_step, p, batches, val_loader.valid_len)
        report["score"] = report["t2v"]["R1"]
        return report
    if cfg.mode == "eval":
        report = run_eval(params)
        save_json(report, f"{cfg.output_dir}/eval_report.json", pretty=True)
        return report
    trainer = GenericTrainer(
        cfg, apply_fn, params, train_loader, eval_fn=run_eval,
        metric_keys=("rank_loss",) if rank_mode else (),
    )
    state = trainer.train()
    report = run_eval(state.params)
    save_json(report, f"{cfg.output_dir}/final_report.json", pretty=True)
    return report


if __name__ == "__main__":
    main()
