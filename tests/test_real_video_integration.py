"""Encoded-video integration: family datasets through FrameSource's
native-reader branch into one SPMD train step.

Round-2 verdict #3/#5: the native reader was tested standalone
(``test_video_reader.py``) and the family datasets on npy/synthetic
sources, but nothing drove an *encoded video* through
``FrameSource`` → ``LfVilaPretrainDataset`` multi-clip reads
(ref ``LF-VILA/src/datasets/pretrain_dataset.py:80-136``) or
``HdVilaClipLoader`` hybrid-res (ref
``hd-vila/src/datasets/dataset_pretrain.py:66-144``) → collator → a train
step. Fixtures are cv2-encoded MJPG AVIs (no libx264 in this image; codec
documented per PERF.md ingest table).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xpretrain_tpu.data.datasets import FrameSource  # noqa: E402
from xpretrain_tpu.data.loader import BatchLoader  # noqa: E402
from xpretrain_tpu.data.tokenization import HashTokenizer  # noqa: E402
from xpretrain_tpu.optim import build_optimizer, get_schedule  # noqa: E402
from xpretrain_tpu.parallel.mesh import create_mesh, shard_host_batch  # noqa: E402
from xpretrain_tpu.parallel.train_step import (  # noqa: E402
    TrainState,
    make_model_train_step,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    """Four encoded MJPG videos, 256×200, 60 frames, index-coded colors."""
    root = tmp_path_factory.mktemp("videos")
    w, h, n = 256, 200, 60
    for v in range(4):
        writer = cv2.VideoWriter(
            str(root / f"vid{v}.avi"), cv2.VideoWriter_fourcc(*"MJPG"), 10, (w, h)
        )
        assert writer.isOpened(), "cv2 has no usable encoder in this image"
        for i in range(n):
            frame = np.full((h, w, 3), 16 * v, np.uint8)
            frame[:, :, 0] = (i * 4) % 256
            writer.write(frame)
        writer.release()
    return str(root)


def test_lfvila_multiclip_video_reads_to_train_step(video_root):
    """Encoded videos → multi-clip FrameSource reads → LF-VILA dataset →
    collator → one stage-1 train step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from xpretrain_tpu.data.datasets_lfvila import (
        LfVilaPretrainCollator,
        LfVilaPretrainDataset,
    )
    from xpretrain_tpu.models.lf_vila.pretrain import LfVilaConfig, LfVilaPretrain

    records = [
        {
            "clips": [f"vid{i % 4}", f"vid{(i + 1) % 4}", f"vid{(i + 2) % 4}", f"vid{(i + 3) % 4}"],
            "sentences": [f"sentence {i} {j}" for j in range(4)],
        }
        for i in range(8)
    ]
    ds = LfVilaPretrainDataset(
        records, FrameSource(video_root), sample_frame=8, sample_clip=4,
        input_hw=(96, 160), train=True, seed=0,
    )
    # the video path must actually be exercised (not a retry-fallback):
    item = ds[0]
    assert item["video_frames"].shape == (3, 8, 96, 160)
    collate = LfVilaPretrainCollator(HashTokenizer(vocab_size=1000), max_sent_len=10, mlm=False)
    batch = next(iter(BatchLoader(ds, 8, collate, seed=0)))
    assert batch["video_frames"].shape == (8, 3, 8, 96, 160)

    cfg = LfVilaConfig.tiny(stage=1, sample_clip=4, sample_frame=8)
    model = LfVilaPretrain(cfg)

    def apply_fn(p, b, r):
        return model.apply(
            {"params": p}, b["video_frames"], b["text_ids"], b["attention_mask"],
            mtc_rng=jax.random.PRNGKey(7),
        )

    from xpretrain_tpu.optim import NO_DECAY_LFVILA

    mesh = create_mesh(devices=jax.devices()[:8])
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["video_frames"][:1]),
        jnp.asarray(batch["text_ids"][:1]),
        jnp.asarray(batch["attention_mask"][:1]),
        mtc_rng=jax.random.PRNGKey(1),
    )["params"]
    tx, _ = build_optimizer(
        params, get_schedule("cosine", 1e-4, 10), no_decay_patterns=NO_DECAY_LFVILA
    )
    with mesh:
        step = make_model_train_step(apply_fn, tx, mesh, donate=False)
        state = TrainState.create(params, tx)
        db = shard_host_batch(
            {k: v for k, v in batch.items() if hasattr(v, "ndim") and v.ndim >= 1}, mesh
        )
        new_state, metrics = step(state, db, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_hdvila_hybrid_res_video_to_train_step(video_root):
    """Encoded videos → HdVilaClipLoader hybrid-res (full-res middle +
    ¼-res neighbors) → collator → one stage-1 train step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from xpretrain_tpu.cli.run_pretrain_hdvila import HdVilaPretrainModel
    from xpretrain_tpu.data.datasets_hdvila import HdVilaPretrainCollator
    from xpretrain_tpu.data.datasets_hdvila_tasks import (
        HdVilaClipLoader,
        HdVilaRetrievalDataset,
    )
    from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoderConfig
    from xpretrain_tpu.models.hd_vila.modeling import HdVilaModelConfig

    loader = HdVilaClipLoader(
        FrameSource(video_root), n_clips=2, num_frm=3, sample_rate=2,
        crop_hw=(128, 192),
    )
    rows = [{"clip_id": f"vid{i % 4}", "text": f"clip about topic {i}"} for i in range(8)]
    ds = HdVilaRetrievalDataset(None, loader, rows=rows, train=True, seed=0)
    item = ds[0]
    assert item["img_middle"].shape == (2, 3, 128, 192)
    assert item["img_other"].shape == (2, 2, 3, 32, 48)

    collate = HdVilaPretrainCollator(
        HashTokenizer(vocab_size=1000), max_txt_len=8, mlm=False, itm=False
    )
    batch = next(iter(BatchLoader(ds, 8, collate, seed=0)))

    enc_cfg = HdVilaEncoderConfig.tiny(timesformer_frames=3, timesformer_hw=(2, 3))
    model = HdVilaPretrainModel(enc_cfg, HdVilaModelConfig.tiny(stage=1), temp=0.05)

    def apply_fn(p, b, r):
        return model.apply(
            {"params": p}, b["img_middle"], b["img_other"],
            b["text_input_ids"], b["text_input_mask"],
        )

    mesh = create_mesh(devices=jax.devices()[:8])
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["img_middle"][:1]),
        jnp.asarray(batch["img_other"][:1]),
        jnp.asarray(batch["text_input_ids"][:1]),
        jnp.asarray(batch["text_input_mask"][:1]),
    )["params"]
    tx, _ = build_optimizer(params, get_schedule("cosine", 1e-4, 10))
    with mesh:
        step = make_model_train_step(apply_fn, tx, mesh, donate=False)
        state = TrainState.create(params, tx)
        db = shard_host_batch(
            {k: v for k, v in batch.items() if hasattr(v, "ndim") and v.ndim >= 1}, mesh
        )
        new_state, metrics = step(state, db, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
