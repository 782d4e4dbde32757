"""Family pretrain runner CLIs smoke-tested with synthetic data (tiny)."""

import numpy as np
import pytest


pytestmark = pytest.mark.slow

def test_lfvila_runner_tiny(tmp_path):
    from xpretrain_tpu.cli import run_pretrain_lfvila

    # override the full preset with tiny dims via CLI flags + a tiny yaml
    cfg_yaml = tmp_path / "tiny.yaml"
    cfg_yaml.write_text(
        """
video_encoder:
  patch_size: [1, 8, 8]
  embed_dim: 32
  depths: [1, 1, 2, 1, 1, 1]
  num_heads: [2, 2, 4, 4, 4, 4]
  stages: [0, 1, 2, 2, 2, 3]
  downsample_stages: [0, 1, 4]
  window_size: [[2, 3, 5], [4, 3, 5], [8, 3, 5], [16, 3, 5], [16, 3, 5], [32, 3, 5]]
  local_window: 4
bert: base
num_local_layers: 2
stage1_layers: 4
sample_frame: 8
sample_clip: 4
"""
    )
    state = run_pretrain_lfvila.main(
        [
            "--config", str(cfg_yaml),
            "--dummy_data", "1",
            "--num_train_steps", "1",
            "--train_batch_size", "8",
            "--input_hw", "96", "160",
            "--sample_frame", "8",
            "--max_txt_len", "8",
            "--output_dir", str(tmp_path / "out"),
            "--log_steps", "1",
            "--bf16", "0",
            "--learning_rate", "1e-4",
        ]
    )
    assert int(state.step) == 1


def test_hdvila_runner_tiny(tmp_path):
    import json

    from xpretrain_tpu.cli import run_pretrain_hdvila

    cfg_json = tmp_path / "tiny.json"
    cfg_json.write_text(
        json.dumps(
            {
                "resnet_depth": 18,
                "hidden_size": 64,
                "timesformer_depth": 1,
                "timesformer_heads": 4,
                "bert": "tiny",
                "crop_size": [128, 192],
                "pixel_random_sampling_size": 0,
            }
        )
    )
    state = run_pretrain_hdvila.main(
        [
            "--config", str(cfg_json),
            "--dummy_data", "1",
            "--num_train_steps", "1",
            "--train_batch_size", "8",
            "--num_frm", "3",
            "--train_n_clips", "1",
            "--output_dir", str(tmp_path / "out"),
            "--log_steps", "1",
            "--bf16", "0",
            "--learning_rate", "1e-4",
        ]
    )
    assert int(state.step) == 1


def test_hdvila_task_datasets():
    from xpretrain_tpu.data.datasets_hdvila_tasks import (
        HdVilaClipLoader,
        HdVilaQACollator,
        HdVilaQADataset,
        HdVilaRetrievalDataset,
    )
    from xpretrain_tpu.data.tokenization import HashTokenizer

    loader = HdVilaClipLoader(None, n_clips=2, num_frm=3, crop_hw=(64, 96), synthetic_seed=0)
    rows = [
        {"clip_id": f"c{i}", "text": f"caption {i}", "question": "what?",
         "options": ["a", "b", "c"], "label": i % 3, "answer": "a"}
        for i in range(4)
    ]
    retr = HdVilaRetrievalDataset(None, loader, rows=rows)
    item = retr[0]
    assert item["img_middle"].shape == (2, 3, 64, 96)

    qa_mc = HdVilaQADataset(None, loader, task_type="action", rows=rows)
    mc_item = qa_mc[1]
    assert len(mc_item["options"]) == 3
    tok = HashTokenizer()
    batch = HdVilaQACollator(tok, max_txt_len=8, multiple_choice=True)([qa_mc[0], qa_mc[1]])
    assert batch["text_input_ids"].shape == (2, 3, 8)
    assert batch["labels"].shape == (2,)

    qa_open = HdVilaQADataset(None, loader, task_type="open", answer_vocab={"a": 0}, rows=rows)
    batch2 = HdVilaQACollator(tok, max_txt_len=8)([qa_open[0]])
    assert batch2["text_input_ids"].shape == (1, 8)
    assert batch2["labels"][0] == 0


def test_hdvila_runner_stage2_frozen(tmp_path):
    """Stage-2 recipe: MLM only (use_itm 0), stage-1 modules frozen via the
    preset's frozen_patterns (ref pretrain_stage2.json / e2e_model.py:188-206)."""
    import json

    from xpretrain_tpu.cli import run_pretrain_hdvila

    cfg_json = tmp_path / "tiny2.json"
    cfg_json.write_text(
        json.dumps(
            {
                "resnet_depth": 18,
                "hidden_size": 64,
                "timesformer_depth": 1,
                "timesformer_heads": 4,
                "bert": "tiny",
                "crop_size": [128, 192],
                "pixel_random_sampling_size": 0,
                "stage": 2,
                "use_mlm": 1,
                "use_itm": 0,
                "frozen_patterns": [
                    "encoder/cnn", "encoder/grid_encoder", "encoder/timesformer",
                    "transformer/t_proj", "transformer/v_proj",
                    "bert/embeddings", "pooler1", "layer_0/", "layer_1/"
                ],
            }
        )
    )
    state = run_pretrain_hdvila.main(
        [
            "--config", str(cfg_json),
            "--dummy_data", "1",
            "--num_train_steps", "1",
            "--train_batch_size", "8",
            "--num_frm", "3",
            "--train_n_clips", "1",
            "--output_dir", str(tmp_path / "out2"),
            "--log_steps", "1",
            "--bf16", "0",
            "--learning_rate", "1e-2",
        ]
    )
    assert int(state.step) == 1
    # the preset's freeze patterns must still match real param paths (the
    # zero-update behavior itself is covered in test_optim)
    import flax

    flat = flax.traverse_util.flatten_dict(state.params, sep="/")
    for pat in ("encoder/cnn", "layer_0/", "pooler1", "bert/embeddings"):
        assert any(pat in k + "/" for k in flat), f"{pat} matched no param path"


def test_lfvila_runner_stage2_tiny(tmp_path):
    from xpretrain_tpu.cli import run_pretrain_lfvila

    cfg_yaml = tmp_path / "tiny_s2.yaml"
    cfg_yaml.write_text(
        """
video_encoder:
  patch_size: [1, 8, 8]
  embed_dim: 32
  depths: [1, 1, 2, 1, 1, 1]
  num_heads: [2, 2, 4, 4, 4, 4]
  stages: [0, 1, 2, 2, 2, 3]
  downsample_stages: [0, 1, 4]
  window_size: [[2, 3, 5], [4, 3, 5], [8, 3, 5], [16, 3, 5], [16, 3, 5], [32, 3, 5]]
  local_window: 4
bert: tiny
num_local_layers: 2
stage1_layers: 4
sample_frame: 8
sample_clip: 4
final_num_patches: 1
stage: 2
mlm_loss_weight: 1.0
vtm_loss_weight: 10.0
frozen_patterns:
  - video_encoder
  - sent_embedding
  - text_encoder/embeddings
  - layer_0/
  - layer_1/
"""
    )
    state = run_pretrain_lfvila.main(
        [
            "--config", str(cfg_yaml),
            "--dummy_data", "1",
            "--num_train_steps", "1",
            "--train_batch_size", "8",
            "--input_hw", "96", "160",
            "--sample_frame", "8",
            "--max_txt_len", "8",
            "--output_dir", str(tmp_path / "out_s2"),
            "--log_steps", "1",
            "--bf16", "0",
            "--learning_rate", "1e-4",
        ]
    )
    assert int(state.step) == 1


def test_stage2_presets_parse():
    """The shipped stage-2 presets load and carry the reference recipe keys."""
    import os

    import yaml

    from xpretrain_tpu.utils.basic import load_json

    root = os.path.join(os.path.dirname(__file__), "..", "xpretrain_tpu", "configs", "presets")
    hd = load_json(os.path.join(root, "hdvila_pretrain_stage2.json"))
    assert hd["stage"] == 2 and hd["use_itm"] == 0 and hd["use_mlm"] == 1
    assert any("layer_11/" in p for p in hd["frozen_patterns"])
    lf = yaml.safe_load(open(os.path.join(root, "lfvila_pretrain_stage2.yaml")))
    assert lf["stage"] == 2
    assert lf["train_batch_size"] == 48
    assert lf["mlm_loss_weight"] == 1.0 and lf["vtm_loss_weight"] == 10.0
    assert "video_encoder" in lf["frozen_patterns"]


def test_lfvila_runner_bert_base_hash_vocab_finite(tmp_path):
    """Regression: with bert 'base' (vocab 30522) the hash tokenizer must be
    clamped to the model vocab — out-of-range ids turned text embeddings
    into NaN (jnp.take fill semantics) and every loss went NaN."""
    import json

    from xpretrain_tpu.cli import run_pretrain_lfvila

    cfg_yaml = tmp_path / "tiny.yaml"
    cfg_yaml.write_text(
        """
video_encoder:
  patch_size: [1, 8, 8]
  embed_dim: 32
  depths: [1, 1, 2, 1, 1, 1]
  num_heads: [2, 2, 4, 4, 4, 4]
  stages: [0, 1, 2, 2, 2, 3]
  downsample_stages: [0, 1, 4]
  window_size: [[2, 3, 5], [4, 3, 5], [8, 3, 5], [16, 3, 5], [16, 3, 5], [32, 3, 5]]
  local_window: 4
bert: base
num_local_layers: 2
stage1_layers: 4
sample_frame: 8
sample_clip: 4
"""
    )
    out = tmp_path / "out"
    state = run_pretrain_lfvila.main(
        [
            "--config", str(cfg_yaml),
            "--dummy_data", "1",
            "--num_train_steps", "1",
            "--train_batch_size", "8",
            "--input_hw", "96", "160",
            "--sample_frame", "8",
            "--max_txt_len", "8",
            "--output_dir", str(out),
            "--log_steps", "1",
            "--bf16", "0",
            "--learning_rate", "1e-4",
        ]
    )
    assert int(state.step) == 1
    rows = [json.loads(l) for l in (out / "log" / "scalars.jsonl").read_text().splitlines()]
    losses = [r["value"] for r in rows if r["tag"] == "train/loss"]
    assert losses and all(np.isfinite(losses)), losses
