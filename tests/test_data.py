import numpy as np
import pytest

from xpretrain_tpu.data.datasets import (
    PretrainCollator,
    RetrievalCollator,
    SyntheticVideoTextDataset,
)
from xpretrain_tpu.data.loader import (
    BatchLoader,
    InfiniteIterator,
    MetaLoader,
    PrefetchLoader,
    SequentialEvalLoader,
)
from xpretrain_tpu.data.tokenization import HashTokenizer, mask_batch_text_tokens
from xpretrain_tpu.data.transforms import CLIP_MEAN, CLIP_STD, clip_transform, resize


def test_synthetic_dataset_deterministic():
    ds = SyntheticVideoTextDataset(size=10, num_frames=4, image_size=16)
    a, b = ds[3], ds[3]
    assert np.array_equal(a["frames"], b["frames"])
    assert a["text"] == b["text"]
    assert a["frames"].shape == (4, 16, 16, 3)


def test_clip_transform_shapes_and_stats():
    frames = np.full((2, 64, 48, 3), 128, dtype=np.uint8)
    out = clip_transform(frames, image_size=32)
    assert out.shape == (2, 3, 32, 32)
    want = (128 / 255.0 - CLIP_MEAN[0]) / CLIP_STD[0]
    assert np.isclose(out[0, 0, 0, 0], want, atol=1e-5)


def test_resize_shorter_side():
    frames = np.zeros((1, 100, 200, 3), dtype=np.uint8)
    out = resize(frames, 50)
    assert out.shape == (1, 50, 100, 3)


def test_hash_tokenizer_batch():
    tok = HashTokenizer()
    ids, mask = tok(["hello world", "a"], max_len=8)
    assert ids.shape == (2, 8)
    assert ids[0, 0] == tok.bot_id
    assert ids[0, 3] == tok.eot_id  # bot + 2 words + eot
    assert mask[0].sum() == 4 and mask[1].sum() == 3
    # argmax-of-ids EOT pooling invariant: eot must be the max id in the row
    assert ids[0].argmax() == 3


def test_mlm_masking_stats():
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 1000, size=(64, 32))
    masked, labels = mask_batch_text_tokens(ids, mask_token_id=1, vocab_size=1000, rng=rng)
    sel = labels != -100
    frac = sel.mean()
    assert 0.10 < frac < 0.20
    # ~80% of selected become [MASK]
    mask_frac = (masked[sel] == 1).mean()
    assert 0.7 < mask_frac < 0.9
    # unselected positions unchanged
    assert np.array_equal(masked[~sel], ids[~sel])


def test_batch_loader_sharding():
    data = list(range(100))
    collate = lambda items: np.asarray(items)
    shards = [
        np.concatenate(list(BatchLoader(data, 4, collate, shuffle=False, process_index=i, process_count=2)))
        for i in range(2)
    ]
    assert len(set(shards[0]) & set(shards[1])) == 0
    # drop_last trims 100 to a multiple of world_batch=8
    assert len(shards[0]) + len(shards[1]) == 96


def test_batch_loader_epoch_shuffle():
    data = list(range(32))
    collate = lambda items: np.asarray(items)
    loader = BatchLoader(data, 8, collate, shuffle=True, seed=0)
    e0 = np.concatenate(list(loader))
    loader.set_epoch(1)
    e1 = np.concatenate(list(loader))
    assert not np.array_equal(e0, e1)
    assert sorted(e0) == sorted(e1)


def test_batch_loader_num_workers_matches_serial():
    """The pooled decode path yields identical batches in identical order
    (futures consumed in index order), including with slow/uneven items."""
    import time

    class SlowDataset:
        def __len__(self):
            return 40

        def __getitem__(self, i):
            time.sleep(0.002 * (i % 3))  # uneven completion order
            return i

    collate = lambda items: np.asarray(items)
    serial = list(BatchLoader(SlowDataset(), 8, collate, shuffle=True, seed=3))
    pooled = list(
        BatchLoader(SlowDataset(), 8, collate, shuffle=True, seed=3,
                    num_workers=4, prefetch_batches=2)
    )
    assert len(serial) == len(pooled) == 5
    for a, b in zip(serial, pooled):
        assert np.array_equal(a, b)


def test_batch_loader_one_worker_is_pooled_not_serial():
    """num_workers=1 means ONE background decode thread (torch DataLoader
    semantics), not the serial inline path: items for upcoming batches are
    decoded while the consumer holds the current one."""
    import threading
    import time

    calls = []
    lock = threading.Lock()

    class CountingDataset:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            with lock:
                calls.append(i)
            return i

    collate = lambda items: np.asarray(items)
    it = iter(
        BatchLoader(CountingDataset(), 4, collate, shuffle=False,
                    num_workers=1, prefetch_batches=2)
    )
    first = next(it)
    deadline = time.time() + 2.0
    while len(calls) < 8 and time.time() < deadline:
        time.sleep(0.01)  # background thread decodes ahead of the consumer
    assert np.array_equal(first, np.arange(4))
    assert len(calls) >= 8, calls  # batch 1 decoded while batch 0 is held
    it.close()


def test_batch_loader_abandoned_pool_cancels_queued_decodes():
    """Closing a pooled iterator early cancels queued item decodes — an
    abandoned loader must not keep churning decode work (or keep retrying
    against a corpus the caller already deleted)."""
    import threading
    import time

    calls = []
    lock = threading.Lock()

    class CountingDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            with lock:
                calls.append(i)
            time.sleep(0.02)
            return i

    collate = lambda items: np.asarray(items)
    it = iter(
        BatchLoader(CountingDataset(), 8, collate, shuffle=False,
                    num_workers=2, prefetch_batches=4)
    )
    next(it)
    it.close()  # consumer walks away mid-epoch
    n_at_close = len(calls)
    time.sleep(0.3)  # in-flight futures may finish; queued ones must not start
    assert len(calls) <= n_at_close + 2, (n_at_close, len(calls))


def test_sequential_eval_loader_order_and_padding():
    data = list(range(10))
    collate = lambda items: np.asarray(items)
    parts = [
        list(SequentialEvalLoader(data, 2, collate, process_index=i, process_count=2))
        for i in range(2)
    ]
    # reassemble in rank-interleaved batch order
    merged = []
    for b0, b1 in zip(parts[0], parts[1]):
        merged.extend([b0, b1])
    flat = np.concatenate(merged)[:10]
    assert np.array_equal(flat, np.arange(10))


def test_meta_loader_ratio_and_determinism():
    collate = lambda items: np.asarray(items)
    la = BatchLoader(list(range(8)), 2, collate, shuffle=False)
    lb = BatchLoader(list(range(8)), 2, collate, shuffle=False)
    m1 = MetaLoader({"a": (la, 3), "b": (lb, 1)}, seed=5)
    tasks1 = [next(m1)[0] for _ in range(40)]
    m2 = MetaLoader(
        {"a": (BatchLoader(list(range(8)), 2, collate, shuffle=False), 3),
         "b": (BatchLoader(list(range(8)), 2, collate, shuffle=False), 1)},
        seed=5,
    )
    tasks2 = [next(m2)[0] for _ in range(40)]
    assert tasks1 == tasks2  # same seed -> same task sequence on every process
    assert tasks1.count("a") > tasks1.count("b")


def test_infinite_iterator_epochs():
    collate = lambda items: np.asarray(items)
    loader = BatchLoader(list(range(4)), 2, collate, shuffle=False)
    it = InfiniteIterator(loader)
    vals = [next(it) for _ in range(5)]
    assert it.epoch == 2
    assert len(vals) == 5


def test_prefetch_loader_passthrough_and_errors():
    src = [1, 2, 3]
    out = list(PrefetchLoader(src, lambda x: x * 10))
    assert out == [10, 20, 30]

    def boom(x):
        raise ValueError("bad batch")

    with pytest.raises(ValueError):
        list(PrefetchLoader(src, boom))


def test_collators():
    tok = HashTokenizer()
    ds = SyntheticVideoTextDataset(size=4, num_frames=2, image_size=16, with_image_branch=True)
    items = []
    for i in range(2):
        it = ds[i]
        from xpretrain_tpu.data.transforms import clip_transform

        it["video"] = clip_transform(it["frames"], 16)
        it["image"] = clip_transform(it["image"], 16)
        items.append(it)
    batch = RetrievalCollator(tok, max_txt_len=16)(items)
    assert batch["video"].shape == (2, 2, 3, 16, 16)
    assert batch["text_input_ids"].shape == (2, 16)
    pt = PretrainCollator(tok, max_txt_len=16, mlm=True)(items)
    assert pt["caption_ids"].shape == (2, 1, 16)
    assert pt["mlm_labels"].shape == (2, 16)
