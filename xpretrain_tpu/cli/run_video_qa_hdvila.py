"""HD-VILA video-QA runner: train + standalone inference.

The runner surface of ``hd-vila/src/tasks/run_video_qa.py:386-705`` (and the
MSR-VTT-MC runner ``run_msrvtt_mc.py:145-316``): multiple-choice heads for
action/transition/MC tasks, classification heads otherwise; ``--mode
inference`` restores the training args.json minus the inference keys and
evaluates a checkpoint (ref ``:653-705``).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from xpretrain_tpu.cli.run_pretrain_hdvila import hdvila_configs_from
from xpretrain_tpu.cli.shared_args import build_shared_parser, parse_args
from xpretrain_tpu.data.datasets import FrameSource
from xpretrain_tpu.data.datasets_hdvila_tasks import (
    HdVilaClipLoader,
    HdVilaQACollator,
    HdVilaQADataset,
)
from xpretrain_tpu.data.loader import BatchLoader, InfiniteIterator, SequentialEvalLoader
from xpretrain_tpu.data.tokenization import build_model_tokenizer
from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoder
from xpretrain_tpu.models.hd_vila.modeling import (
    HdVilaForMultipleChoice,
    HdVilaForRegression,
    HdVilaForSequenceClassification,
)
from xpretrain_tpu.ops.losses import label_smoothing_xent
from xpretrain_tpu.train.checkpoints import CheckpointManager, save_training_meta
from xpretrain_tpu.train.generic_trainer import GenericTrainer
from xpretrain_tpu.utils.basic import load_json, save_json
from xpretrain_tpu.utils.logging import LOGGER, setup_logging

MC_TASKS = ("action", "transition", "mc", "msrvtt_mc")
REGRESSION_TASKS = ("count",)  # TGIF count: MSE head, preds rounded+clamped
                               # to [1, 10] at eval (ref run_video_qa.py:298-300)


class HdVilaQAModel(nn.Module):
    enc_cfg: object
    model_cfg: object
    task_type: str
    num_labels: int = 2

    def setup(self) -> None:
        self.encoder = HdVilaEncoder(self.enc_cfg)
        if self.task_type in MC_TASKS:
            self.head = HdVilaForMultipleChoice(self.model_cfg)
        elif self.task_type in REGRESSION_TASKS:
            self.head = HdVilaForRegression(self.model_cfg)
        else:
            self.head = HdVilaForSequenceClassification(self.model_cfg, self.num_labels)

    def __call__(self, img_middle, img_other, text_input_ids, text_input_mask,
                 labels=None, deterministic=True):
        grid = self.encoder(img_middle, img_other)
        out = self.head(grid, text_input_ids, text_input_mask, deterministic=deterministic)
        if labels is not None:
            if self.task_type in REGRESSION_TASKS:
                logits32 = out["logits"].astype(jnp.float32)
                out["loss"] = jnp.mean((logits32 - labels.astype(jnp.float32)) ** 2)
                pred = jnp.clip(jnp.floor(logits32 + 0.5).astype(jnp.int32), 1, 10)
                out["acc"] = jnp.mean((pred == labels).astype(jnp.float32))
            else:
                out["loss"] = label_smoothing_xent(out["logits"], labels, smoothing=0.0)
                out["acc"] = jnp.mean(
                    (jnp.argmax(out["logits"], -1) == labels).astype(jnp.float32)
                )
        return out


def build_qa_data(cfg, tok):
    """Train loader samples ``train_n_clips`` random windows; the val loader
    spreads ``inference_n_clips`` windows evenly over each video so the
    model's in-forward score aggregation covers the whole clip (the
    reference's multi-clip inference, ``run_video_qa.py:263-280``)."""
    loader_args = dict(
        num_frm=cfg.num_frm,
        sample_rate=cfg.sample_rate or 12,
        crop_hw=tuple(cfg.get("crop_size", (640, 1024))),
    )
    mc = cfg.task_type in MC_TASKS
    collate = HdVilaQACollator(tok, max_txt_len=int(cfg.get("max_txt_len", 40)), multiple_choice=mc)
    pi, pc = jax.process_index(), jax.process_count()
    inf_clips = int(cfg.get("inference_n_clips", 1))
    if cfg.get("dummy_data"):
        clip_loader = HdVilaClipLoader(
            None, n_clips=cfg.train_n_clips, synthetic_seed=cfg.seed, **loader_args
        )
        val_clip_loader = HdVilaClipLoader(
            None, n_clips=inf_clips, synthetic_seed=cfg.seed, **loader_args
        )
        n_opt = int(cfg.get("num_options", 5))
        count = cfg.task_type in REGRESSION_TASKS
        rows = [
            {
                "clip_id": f"c{i}",
                "question": f"question {i}",
                "question_id": 1000 + i,
                "options": [f"opt {j}" for j in range(n_opt)],
                "label": i % n_opt if mc else i % cfg.get("num_labels", 2),
                "answer": 1 + i % 10 if count else "a",
            }
            for i in range(256)
        ]
        train_ds = HdVilaQADataset(None, clip_loader, cfg.task_type, rows=rows, train=True, seed=cfg.seed)
        val_ds = HdVilaQADataset(None, val_clip_loader, cfg.task_type, rows=rows[:64])
    else:
        source = FrameSource(cfg.video_root)
        clip_loader = HdVilaClipLoader(source, n_clips=cfg.train_n_clips, **loader_args)
        val_clip_loader = HdVilaClipLoader(source, n_clips=inf_clips, **loader_args)
        vocab = load_json(cfg.answer_vocab) if cfg.get("answer_vocab") else None
        train_ds = HdVilaQADataset(cfg.train_annotation, clip_loader, cfg.task_type,
                                   answer_vocab=vocab, train=True, seed=cfg.seed)
        val_ds = HdVilaQADataset(cfg.val_annotation, val_clip_loader, cfg.task_type,
                                 answer_vocab=vocab)
    train_loader = InfiniteIterator(
        BatchLoader(train_ds, cfg.train_batch_size, collate, seed=cfg.seed,
                    process_index=pi, process_count=pc)
    )
    val_loader = SequentialEvalLoader(val_ds, cfg.val_batch_size, collate,
                                      process_index=pi, process_count=pc)
    return train_loader, val_loader, val_ds


# TGIF/MSRVTT open-ended QA report per-answer-type accuracy
# (ref dataset_video_qa.py:199-253 evaluate_tgif_qa)
ANSWER_TYPE2IDX = {
    "frameqa": {"object": 0, "number": 1, "color": 2, "location": 3},
    "msrvtt_qa": {k: i for i, k in enumerate(["what", "who", "how", "where", "when"])},
}


def evaluate_qa(model, params, val_loader, mesh, val_ds=None, task_type="open"):
    """Accuracy + per-question predictions (+ per-answer-type breakdown for
    open-ended TGIF/MSRVTT tasks). Clip-score aggregation already happened
    inside the model forward, so each eval row is one question."""
    from xpretrain_tpu.parallel.mesh import shard_host_batch
    from xpretrain_tpu.parallel.train_step import make_eval_step

    eval_step = make_eval_step(
        lambda p, b, r: model.apply(
            {"params": p}, b["img_middle"], b["img_other"],
            b["text_input_ids"], b["text_input_mask"],
        ),
        mesh,
    )
    preds, golds, row_ids = [], [], []
    total = 0
    for batch in val_loader:
        labels = batch.pop("labels")
        ids = batch.pop("ids")
        out = eval_step(params, shard_host_batch(batch, mesh))
        logits = np.asarray(out["logits"], np.float32)
        if task_type in REGRESSION_TASKS:
            pred = np.clip((logits + 0.5).astype(np.int64), 1, 10)
        else:
            pred = np.argmax(logits, -1)
        n = min(len(labels), val_loader.valid_len - total)
        preds.extend(pred[:n].tolist())
        golds.extend(np.asarray(labels[:n]).tolist())
        row_ids.extend(np.asarray(ids[:n]).tolist())
        total += n
    preds_arr = np.asarray(preds)
    golds_arr = np.asarray(golds)
    acc = float((preds_arr == golds_arr).mean()) if total else 0.0
    LOGGER.info("QA accuracy: %.4f (%d samples)", acc, total)
    report = {"accuracy": acc, "score": acc, "n": total}
    if val_ds is not None:
        rows = val_ds.rows
        report["qa_results"] = [
            {"question_id": rows[i].get("question_id", int(i)), "answer": int(p)}
            for i, p in zip(row_ids, preds)
        ]
        type_map = ANSWER_TYPE2IDX.get(task_type)
        if type_map:
            types = np.asarray(
                [type_map.get(str(rows[i].get("answer_type", "")), -1) for i in row_ids]
            )
            for name, idx in type_map.items():
                sel = types == idx
                if sel.any():
                    report[f"{name}_acc"] = float((preds_arr[sel] == golds_arr[sel]).mean())
                    report[f"{name}_ratio"] = float(sel.mean())
    return report


def main(argv=None):
    parser = build_shared_parser("HD-VILA video QA")
    parser.add_argument("--mode", type=str, default="train", choices=["train", "inference"])
    parser.add_argument("--task_type", type=str, default="open")
    parser.add_argument("--num_labels", type=int, default=2)
    parser.add_argument("--num_options", type=int, default=5)
    parser.add_argument("--train_n_clips", type=int, default=2)
    parser.add_argument("--inference_n_clips", type=int, default=1,
                        help="clips spread over the video at eval; scores "
                             "aggregated in-model (ref run_video_qa.py:263)")
    parser.add_argument("--score_agg_func", type=str, default="mean",
                        choices=["mean", "max", "lse"])
    parser.add_argument("--answer_vocab", type=str, default="")
    parser.add_argument("--inference_model_step", type=int, default=-1)
    cfg = parse_args(parser, argv)

    if cfg.mode == "inference":
        # restore the training-time args, dropping inference-only keys
        # (ref run_video_qa.py:653-705)
        args_path = os.path.join(cfg.output_dir, "log", "args.json")
        if os.path.exists(args_path):
            train_args = load_json(args_path)
            for key, value in train_args.items():
                if not str(key).startswith(("inference", "mode")) and key not in (
                    "output_dir",
                ):
                    cfg[key] = value
    setup_logging(cfg.output_dir, jax.process_index())

    enc_cfg, model_cfg = hdvila_configs_from(cfg)
    model = HdVilaQAModel(enc_cfg, model_cfg, cfg.task_type, int(cfg.num_labels))
    tok = build_model_tokenizer(cfg.get("tokenizer", "hash"), model_cfg.bert.vocab_size)
    train_loader, val_loader, val_ds = build_qa_data(cfg, tok)

    sample = next(iter(train_loader))
    params = model.init(
        jax.random.PRNGKey(cfg.seed),
        jnp.asarray(sample["img_middle"][:1]),
        jnp.asarray(sample["img_other"][:1]),
        jnp.asarray(sample["text_input_ids"][:1]),
        jnp.asarray(sample["text_input_mask"][:1]),
        labels=jnp.asarray(sample["labels"][:1]),
    )["params"]
    if cfg.get("e2e_weights_path"):
        # fine-tunes start from pretrained e2e weights (shape-tolerant: the
        # QA head keeps its init, ref load_state_dict_with_mismatch)
        from xpretrain_tpu.data.tokenization import warn_if_hash_with_weights
        from xpretrain_tpu.models.pretrained import load_hdvila_e2e

        warn_if_hash_with_weights(cfg.get("tokenizer", "hash"), cfg["e2e_weights_path"])
        params = load_hdvila_e2e(params, cfg["e2e_weights_path"])

    def apply_fn(p, batch, rng):
        return model.apply(
            {"params": p},
            batch["img_middle"],
            batch["img_other"],
            batch["text_input_ids"],
            batch["text_input_mask"],
            labels=batch["labels"],
            deterministic=False,
            rngs={"dropout": rng},
        )

    if cfg.mode == "inference":
        from xpretrain_tpu.parallel.mesh import create_mesh

        # best-model checkpoints store {"params", "score"} (BestModelSaver)
        mgr = CheckpointManager(f"{cfg.output_dir}/best")
        template = {
            "params": jax.tree_util.tree_map(np.asarray, params),
            "score": np.zeros((), np.float32),
        }
        restored = mgr.restore(template, step=cfg.inference_model_step if cfg.inference_model_step >= 0 else None) if mgr.latest_step() is not None else None
        if restored:
            params = restored["params"]
            LOGGER.info("restored best model (score %.4f)", float(restored["score"]))
        report = evaluate_qa(model, params, val_loader, create_mesh(),
                             val_ds=val_ds, task_type=cfg.task_type)
        save_json(report, f"{cfg.output_dir}/inference_report.json", pretty=True)
        return report

    save_training_meta(cfg.output_dir, cfg)
    trainer = GenericTrainer(
        cfg, apply_fn, params, train_loader,
        eval_fn=lambda p: evaluate_qa(model, p, val_loader, trainer.mesh,
                                      val_ds=val_ds, task_type=cfg.task_type),
        metric_keys=("acc",),
    )
    state = trainer.train()
    report = evaluate_qa(model, state.params, val_loader, trainer.mesh,
                         val_ds=val_ds, task_type=cfg.task_type)
    save_json(report, f"{cfg.output_dir}/final_report.json", pretty=True)
    return report


if __name__ == "__main__":
    main()
