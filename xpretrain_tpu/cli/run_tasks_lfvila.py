"""LF-VILA downstream runner: retrieval / QA-MC / QA-classification / video-cls.

The runner surface of the reference's per-workload trainers
(``LF-VILA/src/tools/trainer_retrieval.py``, ``trainer_qa_multichoice.py``,
``trainer_qa_classification.py``, ``trainer_video_classification.py``):
one CLI with ``--task``, synthetic or annotation-backed data, SPMD training
via GenericTrainer, task-appropriate eval (retrieval R@K with the
concat-gathered features trimmed to valid_len; accuracy elsewhere).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xpretrain_tpu.cli.run_pretrain_lfvila import lfvila_config_from
from xpretrain_tpu.cli.shared_args import build_shared_parser, parse_args
from xpretrain_tpu.data.datasets import FrameSource
from xpretrain_tpu.data.datasets_lfvila import (
    LfVilaPretrainCollator,
    LfVilaPretrainDataset,
    LfVilaRetrievalDataset,
)
from xpretrain_tpu.data.loader import BatchLoader, InfiniteIterator, SequentialEvalLoader
from xpretrain_tpu.data.tokenization import build_tokenizer
from xpretrain_tpu.models.lf_vila.tasks import (
    LfVilaQAClassification,
    LfVilaQAMultichoice,
    LfVilaRetrieval,
    LfVilaVideoClassification,
)
from xpretrain_tpu.optim import NO_DECAY_LFVILA
from xpretrain_tpu.parallel.mesh import shard_host_batch
from xpretrain_tpu.parallel.train_step import make_eval_step
from xpretrain_tpu.train.checkpoints import save_training_meta
from xpretrain_tpu.train.generic_trainer import GenericTrainer
from xpretrain_tpu.train.evaluate import evaluate_retrieval
from xpretrain_tpu.utils.basic import load_jsonl, save_json
from xpretrain_tpu.utils.logging import LOGGER, setup_logging


class _MCCollator:
    """Per-choice per-sentence tokenization [B, n_choice, M, L]."""

    def __init__(self, tokenizer, n_choice: int, sample_clip: int, max_sent_len: int):
        self.tok = tokenizer
        self.n_choice = n_choice
        self.sample_clip = sample_clip
        self.max_sent_len = max_sent_len

    def __call__(self, items):
        B = len(items)
        flat = []
        for it in items:
            for choice in it["choices"]:
                sents = (it["sentences"] + [choice])[: self.sample_clip]
                while len(sents) < self.sample_clip:
                    sents.append("")
                flat.extend(sents)
        ids, mask = self.tok(flat, self.max_sent_len)
        shape = (B, self.n_choice, self.sample_clip, self.max_sent_len)
        return {
            "video_frames": np.stack([it["video_frames"] for it in items]).astype(np.float32),
            "text_ids": ids.reshape(shape),
            "attention_mask": mask.reshape(shape),
            "labels": np.asarray([it["label"] for it in items], np.int64),
        }


def _synth_video_ds(cfg, with_choices=False, n_choice=3, num_labels=10):
    base = LfVilaPretrainDataset(
        [{} for _ in range(256)], None, cfg.sample_frame, cfg.sample_clip,
        tuple(cfg.input_hw), synthetic=True, seed=cfg.seed,
    )

    class _WithLabels:
        def __len__(self):
            return len(base)

        def __getitem__(self, i):
            item = base[i]
            item["label"] = i % (n_choice if with_choices else num_labels)
            if with_choices:
                item["choices"] = [f"choice {j}" for j in range(n_choice)]
            return item

    return _WithLabels()


def main(argv=None):
    parser = build_shared_parser("LF-VILA downstream tasks")
    parser.add_argument("--task", type=str, required=True,
                        choices=["retrieval", "qa_mc", "qa_cls", "video_cls"])
    parser.add_argument("--sample_frame", type=int, default=32)
    parser.add_argument("--sample_clip", type=int, default=4)
    parser.add_argument("--input_hw", type=int, nargs=2, default=[192, 320])
    parser.add_argument("--num_labels", type=int, default=1000)
    parser.add_argument("--num_options", type=int, default=5)
    cfg = parse_args(parser, argv)
    setup_logging(cfg.output_dir, jax.process_index())
    save_training_meta(cfg.output_dir, cfg)

    model_cfg = lfvila_config_from(cfg)
    tok = build_tokenizer(cfg.get("tokenizer", "hash"))
    pi, pc = jax.process_index(), jax.process_count()
    max_sent = int(cfg.get("max_txt_len", 50))

    if cfg.task == "retrieval":
        model = LfVilaRetrieval(model_cfg)
        collate = LfVilaPretrainCollator(tok, max_sent_len=max_sent, mlm=False)
        if cfg.get("dummy_data"):
            train_ds = _synth_video_ds(cfg)
            val_ds = _synth_video_ds(cfg)
        else:
            rows = load_jsonl(cfg.train_annotation)
            source = FrameSource(cfg.video_root)
            train_ds = LfVilaRetrievalDataset(rows, source, cfg.sample_frame,
                                              cfg.sample_clip, tuple(cfg.input_hw), train=True)
            val_ds = LfVilaRetrievalDataset(load_jsonl(cfg.val_annotation), source,
                                            cfg.sample_frame, cfg.sample_clip, tuple(cfg.input_hw))
        args_of = lambda b: (b["video_frames"], b["text_ids"], b["attention_mask"])
    elif cfg.task == "qa_mc":
        model = LfVilaQAMultichoice(model_cfg)
        collate = _MCCollator(tok, cfg.num_options, cfg.sample_clip, max_sent)
        train_ds = _synth_video_ds(cfg, with_choices=True, n_choice=cfg.num_options)
        val_ds = train_ds
        args_of = lambda b: (b["video_frames"], b["text_ids"], b["attention_mask"])
    elif cfg.task == "qa_cls":
        model = LfVilaQAClassification(model_cfg, num_labels=cfg.num_labels)
        collate = LfVilaPretrainCollator(tok, max_sent_len=max_sent, mlm=False)
        train_ds = _synth_video_ds(cfg, num_labels=cfg.num_labels)
        val_ds = train_ds
        args_of = lambda b: (b["video_frames"], b["text_ids"], b["attention_mask"])
    else:  # video_cls
        model = LfVilaVideoClassification(model_cfg, num_labels=cfg.num_labels)
        collate = LfVilaPretrainCollator(tok, max_sent_len=max_sent, mlm=False)
        train_ds = _synth_video_ds(cfg, num_labels=cfg.num_labels)
        val_ds = train_ds
        args_of = lambda b: (b["video_frames"],)

    def collate_with_labels(items):
        batch = collate(items)
        if "labels" not in batch and hasattr(items[0], "get"):
            labels = [it.get("label", 0) for it in items]
            batch["labels"] = np.asarray(labels, np.int64)
        return batch

    train_loader = InfiniteIterator(
        BatchLoader(train_ds, cfg.train_batch_size, collate_with_labels, seed=cfg.seed,
                    process_index=pi, process_count=pc)
    )
    val_loader = SequentialEvalLoader(val_ds, cfg.val_batch_size, collate_with_labels,
                                      process_index=pi, process_count=pc)

    sample = next(iter(train_loader))
    init_kwargs = {} if cfg.task == "retrieval" else {"labels": jnp.asarray(sample["labels"][:1])}
    if cfg.task == "video_cls":
        params = model.init(jax.random.PRNGKey(cfg.seed),
                            jnp.asarray(sample["video_frames"][:1]), **init_kwargs)["params"]
    else:
        params = model.init(
            jax.random.PRNGKey(cfg.seed), *[jnp.asarray(a[:1]) for a in args_of(sample)],
            **init_kwargs,
        )["params"]

    def apply_fn(p, batch, rng):
        kwargs = {} if cfg.task == "retrieval" else {"labels": batch["labels"]}
        return model.apply(
            {"params": p}, *args_of(batch), deterministic=False, rngs={"dropout": rng}, **kwargs
        )

    trainer = GenericTrainer(
        cfg, apply_fn, params, train_loader,
        metric_keys=("acc", "ct_global_loss"),
        no_decay_patterns=NO_DECAY_LFVILA,
    )
    state = trainer.train()

    # final eval
    if cfg.task == "retrieval":
        eval_step = make_eval_step(
            lambda p, b, r: model.apply({"params": p}, *args_of(b)), trainer.mesh
        )

        def loader():
            for b in val_loader:
                b = dict(b)
                b.pop("labels", None)
                yield shard_host_batch(b, trainer.mesh)

        report = evaluate_retrieval(
            lambda p, b: _rename(eval_step(p, b)), state.params, loader(), val_loader.valid_len
        )
        report["score"] = report["t2v"]["R1"]
    else:
        correct = total = 0
        eval_step = make_eval_step(
            lambda p, b, r: model.apply({"params": p}, *args_of(b)), trainer.mesh
        )
        for batch in val_loader:
            labels = batch.pop("labels")
            out = eval_step(state.params, shard_host_batch(batch, trainer.mesh))
            pred = np.argmax(np.asarray(out["logits"]), -1)
            n = min(len(labels), val_loader.valid_len - total)
            correct += int((pred[:n] == labels[:n]).sum())
            total += n
        report = {"accuracy": correct / max(total, 1), "n": total}
        LOGGER.info("%s accuracy: %.4f", cfg.task, report["accuracy"])
    save_json(report, f"{cfg.output_dir}/final_report.json", pretty=True)
    return report


def _rename(out):
    return {
        "vis_features": out["video_global_feat"],
        "text_features": out["text_global_feat"],
    }


if __name__ == "__main__":
    main()
