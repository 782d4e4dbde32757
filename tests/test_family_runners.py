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
