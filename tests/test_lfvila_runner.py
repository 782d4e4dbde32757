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


def test_lfvila_qa_mc_runner(tmp_path, tiny_yaml):
    """How2QA multichoice with span loss on synthetic fixtures."""
    from xpretrain_tpu.cli import run_tasks_lfvila

    report = run_tasks_lfvila.main(
        _common(tmp_path, tiny_yaml, "qa_mc") + ["--max_num_subtitle", "2"]
    )
    assert 0.0 <= report["accuracy"] <= 1.0


def test_lfvila_qa_cls_violin_runner(tmp_path, tiny_yaml):
    from xpretrain_tpu.cli import run_tasks_lfvila

    report = run_tasks_lfvila.main(
        _common(tmp_path, tiny_yaml, "qa_cls")
        + ["--qa_dataset", "violin", "--num_labels", "2", "--max_num_subtitle", "2"]
    )
    assert 0.0 <= report["accuracy"] <= 1.0


def test_lfvila_qa_mc_annotation_backed(tmp_path, tiny_yaml):
    """Full real-data path: jsonl rows + npy frame store through the runner."""
    import json

    import numpy as np

    from xpretrain_tpu.cli import run_tasks_lfvila

    vid_dir = tmp_path / "videos"
    vid_dir.mkdir()
    rng = np.random.default_rng(0)
    for vid in ("clipA", "clipB"):
        np.save(vid_dir / f"{vid}.npy",
                rng.integers(0, 256, size=(24, 110, 180, 3), dtype=np.uint8))
    rows = [
        {
            "clip_id": ["clipA", "clipB"][i % 2],
            "span": [1.0, 4.0],
            "text_q": "what happens",
            "text_a": ["a", "b", "c", "d"],
            "text_s": [{"text": "sub one", "start": 0.0, "end": 4.0}],
            "answer_idx": i % 4,
        }
        for i in range(8)  # batch must divide the 8-device test mesh
    ]
    ann = tmp_path / "how2qa.jsonl"
    ann.write_text("\n".join(json.dumps(r) for r in rows))

    args = _common(tmp_path, tiny_yaml, "qa_mc")
    args.remove("--dummy_data"); args.remove("1")
    args += [
        "--train_annotation", str(ann),
        "--val_annotation", str(ann),
        "--video_root", str(vid_dir),
        "--max_num_subtitle", "2",
    ]
    report = run_tasks_lfvila.main(args)
    assert 0.0 <= report["accuracy"] <= 1.0
