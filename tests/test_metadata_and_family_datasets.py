"""PackedRecordStore, sharded annotations, HD-VILA/LF-VILA dataset shapes."""

import json

import numpy as np

from xpretrain_tpu.data.datasets_hdvila import HdVilaPretrainCollator, HdVilaPretrainDataset
from xpretrain_tpu.data.datasets_lfvila import (
    LfVilaPretrainCollator,
    LfVilaPretrainDataset,
    merge_sentences_greedy,
)
from xpretrain_tpu.data.metadata import (
    PackedRecordStore,
    PackedStoreDataset,
    ShardedAnnotations,
    stable_hash,
)
from xpretrain_tpu.data.tokenization import HashTokenizer


def test_packed_store_roundtrip(tmp_path):
    prefix = str(tmp_path / "store")
    records = [{"i": i, "text": f"row {i}"} for i in range(100)]
    store = PackedRecordStore.build(prefix, records, keys=[f"k{i}" for i in range(100)])
    assert len(store) == 100
    assert store.get_json(42) == {"i": 42, "text": "row 42"}
    assert json.loads(store.get_by_key("k7")) == {"i": 7, "text": "row 7"}
    ds = PackedStoreDataset(store)
    assert ds[99]["i"] == 99
    store.close()
    # re-open from disk
    store2 = PackedRecordStore(prefix)
    assert store2.get_json(0)["i"] == 0
    store2.close()


def test_sharded_annotations(tmp_path):
    for i in range(3):
        with open(tmp_path / f"part{i}.jsonl", "w") as f:
            for j in range(4):
                f.write(json.dumps({"shard": i, "row": j}) + "\n")
    sharded = ShardedAnnotations(str(tmp_path / "part{}.jsonl"), 3)
    assert sharded.current()[0]["shard"] == 0
    sharded.advance()
    assert sharded.current()[0]["shard"] == 1
    sharded.advance()
    sharded.advance()
    assert sharded.current()[0]["shard"] == 0  # wraps


def test_sharded_reload_loader(tmp_path):
    import numpy as np

    from xpretrain_tpu.data.loader import ShardedReloadLoader

    for i in range(2):
        with open(tmp_path / f"part{i}.jsonl", "w") as f:
            for j in range(8):
                f.write(json.dumps({"value": i * 100 + j}) + "\n")
    shards = ShardedAnnotations(str(tmp_path / "part{}.jsonl"), 2)
    loader = ShardedReloadLoader(
        shards,
        dataset_factory=lambda rows: [r["value"] for r in rows],
        batch_size=4,
        collate_fn=lambda items: np.asarray(items),
        reload_steps=3,
    )
    it = iter(loader)
    first = [next(it) for _ in range(3)]
    assert all(b.max() < 100 for b in first)  # shard 0
    second = [next(it) for _ in range(3)]
    assert all(b.min() >= 100 for b in second)  # shard 1 after reload
    third = next(it)
    assert third.max() < 100  # wrapped back to shard 0


def test_stable_hash_deterministic():
    assert stable_hash("abc", 16) == stable_hash("abc", 16)
    assert 0 <= stable_hash("xyz", 7) < 7


def test_hdvila_dataset_and_collator():
    ds = HdVilaPretrainDataset(
        None, None, train_n_clips=2, num_frm=3, crop_hw=(64, 96), synthetic_size=8
    )
    item = ds[0]
    assert item["img_middle"].shape == (2, 3, 64, 96)
    assert item["img_other"].shape == (2, 2, 3, 16, 24)
    collate = HdVilaPretrainCollator(HashTokenizer(), max_txt_len=16, seed=0)
    batch = collate([ds[0], ds[1], ds[2], ds[3]])
    assert batch["img_middle"].shape == (4, 2, 3, 64, 96)
    assert batch["text_input_ids"].shape == (4, 16)
    assert set(np.unique(batch["itm_labels"])) <= {0, 1}
    assert batch["mlm_labels"].shape == (4, 16)


def test_lfvila_dataset_and_collator():
    ds = LfVilaPretrainDataset(
        [{} for _ in range(4)], None, sample_frame=8, sample_clip=4,
        input_hw=(48, 80), synthetic=True,
    )
    item = ds[0]
    assert item["video_frames"].shape == (3, 8, 48, 80)
    assert len(item["sentences"]) == 4
    collate = LfVilaPretrainCollator(HashTokenizer(), max_sent_len=12)
    batch = collate([ds[0], ds[1]])
    assert batch["video_frames"].shape == (2, 3, 8, 48, 80)
    assert batch["text_ids"].shape == (2, 4, 12)
    assert batch["mlm_labels"].shape == (2, 48)


def test_merge_sentences_greedy():
    merged = merge_sentences_greedy(["aaaa", "b", "c", "dddd", "ee"], 3)
    assert len(merged) == 3
    assert " ".join(merged).replace("  ", " ").split() == ["aaaa", "b", "c", "dddd", "ee"]
    padded = merge_sentences_greedy(["only one"], 3)
    assert padded == ["only one", "", ""]
