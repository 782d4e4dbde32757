"""LF-VILA downstream benchmark datasets: row-format parsing, collator
layouts, and temporal-label parity with the reference loader.

Row formats mirror the reference jsonl layouts exactly
(``LF-VILA/src/datasets/how2qa_dataset.py``, ``violin_dataset.py``,
``actnet_qa_dataset.py``, ``video_classification_dataset.py``).
"""

import numpy as np
import pytest

from xpretrain_tpu.data.datasets import FrameSource
from xpretrain_tpu.data.datasets_lfvila_tasks import (
    ActnetQACollator,
    ActnetQADataset,
    How2QACollator,
    How2QADataset,
    VideoClsCollator,
    VideoClsDataset,
    ViolinCollator,
    ViolinDataset,
    get_temporal_loss_label,
    merge_subtitles_greedy,
)
from xpretrain_tpu.data.sample_frames import span_jitter_linspace_sample
from xpretrain_tpu.data.tokenization import HashTokenizer


@pytest.fixture()
def npy_source(tmp_path):
    """Two fake long videos stored as frame arrays."""
    rng = np.random.default_rng(0)
    for vid in ("vidA", "vidB"):
        frames = rng.integers(0, 256, size=(40, 48, 64, 3), dtype=np.uint8)
        np.save(tmp_path / f"{vid}.npy", frames)
    return FrameSource(str(tmp_path))


HOW2QA_ROWS = [
    {
        "clip_id": "vidA",
        "span": [2.0, 6.0],
        "text_q": "what is happening",
        "text_a": ["opt a", "opt b", "opt c", "opt d"],
        "text_s": [
            {"text": "first subtitle", "start": 0.0, "end": 3.0},
            {"text": "second subtitle", "start": 3.0, "end": 8.0},
            {"text": "third one", "start": 8.0, "end": 10.0},
        ],
        "answer_idx": 2,
    },
    {
        "clip_id": "vidB",
        "span": [float("nan"), float("nan")],
        "text_q": "why",
        "text_a": ["w", "x", "y", "z"],
        "text_s": [],
        "answer_idx": 0,
    },
]


def test_how2qa_row_parsing_and_collation(npy_source):
    ds = How2QADataset(
        HOW2QA_ROWS, npy_source, sample_frame=8, input_hw=(32, 48),
        train=False, max_num_subtitle=2,
    )
    items = [ds[0], ds[1]]
    assert items[0]["label"] == 2 and items[1]["label"] == 0
    assert items[0]["video_frames"].shape == (3, 8, 32, 48)
    # 3 subtitles merged down to 2 (greedy shortest-pair)
    assert len(items[0]["subtitles"]) == 2
    # span labels over the 8 sampled frame slots
    assert items[0]["span_labels"].shape == (8,)

    batch = How2QACollator(HashTokenizer(), max_sent_len=6, max_num_subtitle=2)(items)
    assert batch["text_ids"].shape == (2, 4, 4, 6)  # [B, 4 choices, q+a+2 subs, L]
    assert batch["attention_mask"].shape == (2, 4, 4, 6)
    assert batch["span_labels"].shape == (2, 8)
    assert batch["span_label_weights"].shape == (2, 8)
    # question row identical across choices; answer row differs
    assert (batch["text_ids"][0, 0, 0] == batch["text_ids"][0, 3, 0]).all()
    assert (batch["text_ids"][0, 0, 1] != batch["text_ids"][0, 1, 1]).any()
    # missing subtitles are zero-id zero-mask rows (ref zero-pads token ids)
    assert (batch["text_ids"][1, :, 2:] == 0).all()
    assert (batch["attention_mask"][1, :, 2:] == 0).all()


def test_violin_rows(npy_source):
    rows = [
        {"clip_id": "vidA", "text_q": "someone is cooking",
         "text_s": [{"text": "hi", "start": 0, "end": 2}], "answer": 1},
        {"clip_id": "vidB", "text_q": "nobody moves", "text_s": [], "answer": 0},
    ]
    ds = ViolinDataset(rows, npy_source, sample_frame=4, input_hw=(32, 48),
                       train=False, max_num_subtitle=2)
    batch = ViolinCollator(HashTokenizer(), max_sent_len=5, max_num_subtitle=2)(
        [ds[0], ds[1]]
    )
    assert batch["text_ids"].shape == (2, 3, 5)  # statement + 2 subtitle rows
    assert list(batch["labels"]) == [1, 0]
    assert (batch["text_ids"][1, 1:] == 0).all()  # no subtitles -> zero rows


def test_actnet_and_videocls_rows(npy_source):
    qa_rows = [{"video_name": "vidA", "question": "what color", "answer": 17}]
    ds = ActnetQADataset(qa_rows, npy_source, sample_frame=4, input_hw=(32, 48), train=False)
    batch = ActnetQACollator(HashTokenizer(), max_sent_len=5)([ds[0]])
    assert batch["text_ids"].shape == (1, 1, 5)
    assert batch["labels"][0] == 17

    cls_rows = [{"video_id": "vidB", "recipe_type": "42"}]
    dsc = VideoClsDataset(cls_rows, npy_source, sample_frame=4, input_hw=(32, 48), train=False)
    bc = VideoClsCollator()([dsc[0]])
    assert bc["video_frames"].shape == (1, 3, 4, 32, 48)
    assert bc["labels"][0] == 42
    assert "text_ids" not in bc


def test_synthetic_mode_deterministic():
    ds = How2QADataset([{} for _ in range(4)], None, sample_frame=4,
                       input_hw=(32, 48), train=True, synthetic=True, seed=7)
    a, b = ds[1], ds[1]
    assert (a["video_frames"] == b["video_frames"]).all()
    assert a["question"] == b["question"]
    assert a["label"] == 1 % 4


def test_temporal_label_semantics():
    # 90-frame video at fps=3 -> 30s; span [6, 12]s over 8 slots -> slots [2,3)
    label, weight = get_temporal_loss_label([7.5, 11.25], 90, num_labels=8)
    assert label.tolist() == [0, 0, 1, 0, 0, 0, 0, 0]
    # weights: in-span mass 0.5 and out-of-span mass 0.5
    assert np.isclose(weight[label == 1].sum(), 8 * 0.5)
    assert np.isclose(weight[label == 0].sum() / (8 * 0.5 / 7) / 7, 1.0)
    # NaN span -> whole video positive
    label2, _ = get_temporal_loss_label([float("nan"), float("nan")], 90, num_labels=8)
    assert label2.tolist() == [1] * 8


def test_merge_subtitles_greedy():
    texts = ["aaaa", "b", "c", "dddd"]
    spans = [(0, 1), (1, 2), (2, 3), (3, 4)]
    m_texts, m_spans = merge_subtitles_greedy(texts, spans, 3)
    assert m_texts == ["aaaa", "b c", "dddd"]
    assert m_spans == [(0, 1), (1, 3), (3, 4)]


def test_span_jitter_linspace_eval_exact():
    idx = span_jitter_linspace_sample(40, 8, test_mode=True)
    assert idx.tolist() == np.linspace(0, 39, 8).astype(int).tolist()
    rng = np.random.default_rng(0)
    tr = span_jitter_linspace_sample(40, 8, rng)
    assert len(tr) == 8 and tr.min() >= 0 and tr.max() <= 39
    assert (np.diff(tr) >= 0).all()


@pytest.mark.slow
def test_temporal_label_parity_with_reference():
    """Drive the reference get_temporal_loss_label on random spans."""
    import importlib.util
    import os
    import sys
    import types

    pytest.importorskip("torch")
    path = "/root/reference/LF-VILA/src/datasets/how2qa_dataset.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    for name in ("jsonlines", "decord", "lmdb"):
        mod = types.ModuleType(name)
        if name == "decord":
            mod.VideoReader = object
            mod.cpu = lambda *a: None
            mod.bridge = types.SimpleNamespace(set_bridge=lambda *a: None)
        sys.modules.setdefault(name, mod)
    src_pkg = types.ModuleType("src")
    src_utils = types.ModuleType("src.utils")
    src_logger = types.ModuleType("src.utils.logger")
    src_logger.LOGGER = types.SimpleNamespace(info=lambda *a, **k: None)
    for n, m in [("src", src_pkg), ("src.utils", src_utils), ("src.utils.logger", src_logger)]:
        sys.modules.setdefault(n, m)
    spec = importlib.util.spec_from_file_location("ref_how2qa", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.default_rng(3)
    for _ in range(50):
        num_frame = int(rng.integers(10, 400))
        t = num_frame / 3.0
        span = sorted(rng.uniform(-1.0, t * 1.2, size=2).tolist())
        if rng.random() < 0.2:
            span = [float("nan"), float("nan")]
        n_labels = int(rng.integers(4, 64))
        ours_l, ours_w = get_temporal_loss_label(span, num_frame, num_labels=n_labels)
        ref_l, ref_w = ref.get_temporal_loss_label(span, num_frame, num_labels=n_labels)
        assert ours_l.tolist() == list(ref_l), (span, num_frame, n_labels)
        np.testing.assert_allclose(ours_w, np.asarray(ref_w, np.float32), rtol=1e-6)
