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
from xpretrain_tpu.data.datasets_lfvila_tasks import (
    ActnetQACollator,
    ActnetQADataset,
    How2QACollator,
    How2QADataset,
    VideoClsCollator,
    VideoClsDataset,
    ViolinCollator,
    ViolinDataset,
)
from xpretrain_tpu.data.loader import BatchLoader, InfiniteIterator, SequentialEvalLoader
from xpretrain_tpu.data.tokenization import build_model_tokenizer
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


def _task_datasets(cfg, ds_cls, **extra):
    """(train, val) benchmark datasets — synthetic fixtures under
    ``--dummy_data``, jsonl-annotation-backed otherwise."""
    common = dict(
        sample_frame=cfg.sample_frame,
        input_hw=tuple(cfg.input_hw),
        seed=cfg.seed,
        **extra,
    )
    if cfg.get("dummy_data"):
        rows = [{} for _ in range(256)]
        train = ds_cls(rows, None, train=True, synthetic=True, **common)
        val = ds_cls(rows, None, train=False, synthetic=True, **common)
        return train, val
    source = FrameSource(cfg.video_root)
    train = ds_cls(load_jsonl(cfg.train_annotation), source, train=True, **common)
    val = ds_cls(load_jsonl(cfg.val_annotation), source, train=False, **common)
    return train, val


def main(argv=None):
    parser = build_shared_parser("LF-VILA downstream tasks")
    parser.add_argument("--task", type=str, required=True,
                        choices=["retrieval", "qa_mc", "qa_cls", "video_cls"])
    parser.add_argument("--sample_frame", type=int, default=32)
    parser.add_argument("--sample_clip", type=int, default=4)
    parser.add_argument("--input_hw", type=int, nargs=2, default=[192, 320])
    parser.add_argument("--num_labels", type=int, default=0,
                        help="0 = benchmark default (how2qa 4-way; violin 2; "
                             "actnet 1654; video_cls 180)")
    parser.add_argument("--num_options", type=int, default=4)
    parser.add_argument("--qa_dataset", type=str, default="",
                        choices=["", "how2qa", "violin", "actnet"],
                        help="benchmark row format for qa tasks (qa_mc -> how2qa; "
                             "qa_cls -> violin|actnet, default actnet)")
    parser.add_argument("--max_num_subtitle", type=int, default=6)
    parser.add_argument("--use_span_loss", type=int, default=1,
                        help="how2qa temporal span loss (ref how2_qa.yaml:72)")
    parser.add_argument("--span_loss_weight", type=float, default=1.0)
    parser.add_argument("--model_weight", type=str, default="",
                        help="pretrained LFVILA torch checkpoint to fine-tune from "
                             "(shape-tolerant; task heads keep their init)")
    cfg = parse_args(parser, argv)
    setup_logging(cfg.output_dir, jax.process_index())
    save_training_meta(cfg.output_dir, cfg)

    model_cfg = lfvila_config_from(cfg)
    tok = build_model_tokenizer(cfg.get("tokenizer", "hash"), model_cfg.bert.vocab_size)
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
        # How2QA: 4-way multichoice with subtitles + temporal span labels
        # (ref LF-VILA/src/datasets/how2qa_dataset.py, configs/how2_qa.yaml)
        model = LfVilaQAMultichoice(model_cfg)
        collate = How2QACollator(tok, max_sent, cfg.max_num_subtitle)
        train_ds, val_ds = _task_datasets(
            cfg, How2QADataset, max_num_subtitle=cfg.max_num_subtitle
        )
        args_of = lambda b: (b["video_frames"], b["text_ids"], b["attention_mask"])
    elif cfg.task == "qa_cls":
        # VIOLIN (binary statement verification) or ActivityNet-QA
        # (answer-vocab classification) — both drive LfVilaQAClassification
        # (ref run_qa.py:107-110 qa_type=='classification')
        qa_ds = cfg.qa_dataset or "actnet"
        num_labels = cfg.num_labels or {"violin": 2, "actnet": 1654}[qa_ds]
        model = LfVilaQAClassification(model_cfg, num_labels=num_labels)
        if qa_ds == "violin":
            collate = ViolinCollator(tok, max_sent, min(cfg.max_num_subtitle, 4))
            train_ds, val_ds = _task_datasets(
                cfg, ViolinDataset, max_num_subtitle=min(cfg.max_num_subtitle, 4)
            )
        else:
            collate = ActnetQACollator(tok, max_sent)
            train_ds, val_ds = _task_datasets(cfg, ActnetQADataset, num_labels=num_labels)
        args_of = lambda b: (b["video_frames"], b["text_ids"], b["attention_mask"])
    else:  # video_cls (COIN/LVU, ref video_classification_dataset.py)
        num_labels = cfg.num_labels or 180
        model = LfVilaVideoClassification(model_cfg, num_labels=num_labels)
        collate = VideoClsCollator()
        train_ds, val_ds = _task_datasets(cfg, VideoClsDataset, num_labels=num_labels)
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
    if cfg.get("model_weight"):
        # fine-tune from a pretrained checkpoint (ref trainer_* WEIGHTS use);
        # the task models share video_encoder/text_encoder/projection names
        # with the pretrain module, so the full-checkpoint converter merges
        from xpretrain_tpu.data.tokenization import warn_if_hash_with_weights
        from xpretrain_tpu.models.pretrained import load_lfvila_cascade

        warn_if_hash_with_weights(cfg.get("tokenizer", "hash"), cfg["model_weight"])
        params = load_lfvila_cascade(params, model_weight=cfg["model_weight"])

    def apply_fn(p, batch, rng):
        kwargs = {} if cfg.task == "retrieval" else {"labels": batch["labels"]}
        if cfg.task == "qa_mc" and cfg.use_span_loss and "span_labels" in batch:
            kwargs["span_labels"] = batch["span_labels"]
            kwargs["span_label_weights"] = batch["span_label_weights"]
        out = model.apply(
            {"params": p}, *args_of(batch), deterministic=False, rngs={"dropout": rng}, **kwargs
        )
        if "span_loss" in out:
            # total = choice loss + weighted temporal span loss
            # (ref trainer_qa_multichoice.py:190-196)
            out["loss"] = out["loss"] + cfg.span_loss_weight * out["span_loss"]
        return out

    trainer = GenericTrainer(
        cfg, apply_fn, params, train_loader,
        metric_keys=("acc", "ct_global_loss", "span_loss", "span_acc"),
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
