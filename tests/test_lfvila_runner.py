"""LF-VILA downstream runner smoke tests (tiny synthetic)."""

import pytest

TINY_YAML = """
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
final_num_patches: 1
"""
# note: bert "base" is replaced below — the builder reads hidden sizes from
# BertConfig factories, so tests shrink via a custom tiny factory flag


pytestmark = pytest.mark.slow

@pytest.fixture()
def tiny_yaml(tmp_path):
    p = tmp_path / "tiny.yaml"
    # swap in a tiny bert via the same builder trick used by LfVilaConfig.tiny:
    # Swin num_features = 32 * 2^3 = 256 must equal bert hidden size
    p.write_text(TINY_YAML.replace("bert: base", "bert: tiny"))
    return str(p)


def _common(tmp_path, tiny_yaml, task):
    return [
        "--config", tiny_yaml,
        "--task", task,
        "--dummy_data", "1",
        "--num_train_steps", "1",
        "--train_batch_size", "8",
        "--val_batch_size", "8",
        "--input_hw", "96", "160",
        "--sample_frame", "8",
        "--max_txt_len", "8",
        "--output_dir", str(tmp_path / f"out_{task}"),
        "--log_steps", "1",
        "--bf16", "0",
        "--learning_rate", "1e-4",
        "--num_labels", "7",
        "--num_options", "3",
    ]


def test_lfvila_video_cls_runner(tmp_path, tiny_yaml):
    from xpretrain_tpu.cli import run_tasks_lfvila

    report = run_tasks_lfvila.main(_common(tmp_path, tiny_yaml, "video_cls"))
    assert 0.0 <= report["accuracy"] <= 1.0


def test_lfvila_retrieval_runner(tmp_path, tiny_yaml):
    from xpretrain_tpu.cli import run_tasks_lfvila

    report = run_tasks_lfvila.main(_common(tmp_path, tiny_yaml, "retrieval"))
    assert "t2v" in report
