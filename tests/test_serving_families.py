"""HD-VILA and LF-VILA serving exports: export → save → load → call parity.

Round-4 verdict #10: three-family serving coverage. Same contract as the
CLIP-ViP artifact tests (`tests/test_serving_artifact.py`): the deserialized
towers must reproduce the live model's retrieval features exactly on the
same platform, serve multiple batch sizes from one export, and round-trip
through the `.xpsa` zip with no model code on the load path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpretrain_tpu.serving import (
    export_hdvila_retrieval_towers,
    export_lfvila_retrieval_towers,
    load_artifact,
    save_artifact,
)

pytestmark = pytest.mark.slow


# ---------------------------------------------------------------- HD-VILA
HD_CLIPS, HD_LO, HD_HI_SIZE, HD_LO_SIZE, HD_SEQ = 2, 2, (64, 128), (16, 32), 12


@pytest.fixture(scope="module")
def hdvila_model():
    from xpretrain_tpu.cli.run_pretrain_hdvila import HdVilaPretrainModel
    from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoderConfig
    from xpretrain_tpu.models.hd_vila.modeling import HdVilaModelConfig

    enc_cfg = HdVilaEncoderConfig.tiny(timesformer_frames=3, timesformer_hw=(1, 2))
    model = HdVilaPretrainModel(enc_cfg, HdVilaModelConfig.tiny(stage=1), temp=0.05)
    mid, oth, ids, mask = _hd_batch(np.random.default_rng(0), 1)
    variables = model.init(jax.random.PRNGKey(0), mid, oth, ids, mask)
    return model, variables


def _hd_batch(rng, b):
    mid = jnp.asarray(
        rng.integers(0, 255, size=(b, HD_CLIPS, 3, *HD_HI_SIZE)).astype(np.float32))
    oth = jnp.asarray(
        rng.integers(0, 255, size=(b, HD_CLIPS, HD_LO, 3, *HD_LO_SIZE)).astype(np.float32))
    ids = jnp.asarray(rng.integers(2, 1000, size=(b, HD_SEQ)).astype(np.int32))
    mask = jnp.ones((b, HD_SEQ), jnp.int32)
    return mid, oth, ids, mask


@pytest.fixture(scope="module")
def hdvila_artifact_path(hdvila_model, tmp_path_factory):
    model, variables = hdvila_model
    art = export_hdvila_retrieval_towers(
        model, variables, n_clips=HD_CLIPS, n_lo_frames=HD_LO,
        hi_size=HD_HI_SIZE, lo_size=HD_LO_SIZE, seq_len=HD_SEQ,
    )
    path = str(tmp_path_factory.mktemp("serving") / "hdvila_tiny.xpsa")
    save_artifact(path, art)
    return path


def test_hdvila_artifact_matches_live_model(hdvila_model, hdvila_artifact_path, rng):
    model, variables = hdvila_model
    art = load_artifact(hdvila_artifact_path)
    mid, oth, ids, mask = _hd_batch(rng, 3)

    want_v = model.apply(variables, mid, oth, method=type(model).forward_video)
    want_t = model.apply(variables, ids, mask, method=type(model).forward_text)
    got_v = art.encode_video(mid, oth)
    got_t = art.encode_text(ids, mask)

    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(got_v), axis=-1), 1.0, atol=1e-5)

    # the tower features ARE the stage-1 ITC features of the full forward
    full = model.apply(variables, mid, oth, ids, mask)
    np.testing.assert_allclose(np.asarray(full["vis_features"]), np.asarray(got_v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(full["text_features"]), np.asarray(got_t), atol=1e-6)


def test_hdvila_symbolic_batch_and_meta(hdvila_artifact_path, rng):
    art = load_artifact(hdvila_artifact_path)
    assert art.meta["family"] == "hd_vila"
    assert art.meta["temp"] == pytest.approx(0.05)
    for b in (1, 2):
        mid, oth, ids, mask = _hd_batch(rng, b)
        v = art.encode_video(mid, oth)
        t = art.encode_text(ids, mask)
        assert v.shape[0] == b and t.shape[0] == b
    scores = np.asarray(art.similarity(t, v))
    scaled = np.asarray(art.similarity(t, v, scaled=True))
    np.testing.assert_allclose(scaled, scores / art.meta["temp"], rtol=1e-5)


# ---------------------------------------------------------------- LF-VILA
LF_FRAMES, LF_SIZE, LF_SENT, LF_LEN = 8, (96, 160), 4, 10


@pytest.fixture(scope="module")
def lfvila_model():
    from xpretrain_tpu.models.lf_vila.pretrain import LfVilaConfig
    from xpretrain_tpu.models.lf_vila.tasks import LfVilaRetrieval

    cfg = LfVilaConfig.tiny(sample_clip=4, sample_frame=LF_FRAMES, final_num_patches=1)
    model = LfVilaRetrieval(cfg)
    video, ids, mask = _lf_batch(np.random.default_rng(0), 1)
    variables = model.init(jax.random.PRNGKey(0), video, ids, mask)
    return model, variables


def _lf_batch(rng, b):
    video = jnp.asarray(rng.normal(size=(b, 3, LF_FRAMES, *LF_SIZE)).astype(np.float32))
    ids = jnp.asarray(rng.integers(2, 1000, size=(b, LF_SENT, LF_LEN)).astype(np.int32))
    mask = jnp.ones((b, LF_SENT, LF_LEN), jnp.int32)
    return video, ids, mask


@pytest.fixture(scope="module")
def lfvila_artifact_path(lfvila_model, tmp_path_factory):
    model, variables = lfvila_model
    art = export_lfvila_retrieval_towers(
        model, variables, frames=LF_FRAMES, image_size=LF_SIZE,
        n_sent=LF_SENT, sent_len=LF_LEN,
    )
    path = str(tmp_path_factory.mktemp("serving") / "lfvila_tiny.xpsa")
    save_artifact(path, art)
    return path


def test_lfvila_artifact_matches_live_model(lfvila_model, lfvila_artifact_path, rng):
    model, variables = lfvila_model
    art = load_artifact(lfvila_artifact_path)
    video, ids, mask = _lf_batch(rng, 3)

    want_v = model.apply(variables, video, method=type(model).forward_video)
    want_t = model.apply(variables, ids, mask, method=type(model).forward_text)
    got_v = art.encode_video(video)
    got_t = art.encode_text(ids, mask)

    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), atol=1e-6)

    # the tower features ARE the dual-encoder features of the full forward
    full = model.apply(variables, video, ids, mask)
    np.testing.assert_allclose(
        np.asarray(full["video_global_feat"]), np.asarray(got_v), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(full["text_global_feat"]), np.asarray(got_t), atol=1e-6)


def test_lfvila_symbolic_batch_and_meta(lfvila_artifact_path, rng):
    art = load_artifact(lfvila_artifact_path)
    assert art.meta["family"] == "lf_vila"
    for b in (1, 2):
        video, ids, mask = _lf_batch(rng, b)
        v = art.encode_video(video)
        t = art.encode_text(ids, mask)
        assert v.shape[0] == b and t.shape[0] == b
    scores = np.asarray(art.similarity(t, v))
    scaled = np.asarray(art.similarity(t, v, scaled=True))
    np.testing.assert_allclose(scaled, scores / art.meta["temp"], rtol=1e-5)
