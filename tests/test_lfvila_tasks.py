"""LF-VILA downstream task model tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpretrain_tpu.models.lf_vila.pretrain import LfVilaConfig
from xpretrain_tpu.models.lf_vila.tasks import (
    LfVilaQAClassification,
    LfVilaQAMultichoice,
    LfVilaRetrieval,
    LfVilaVideoClassification,
)


pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def cfg():
    return LfVilaConfig.tiny(sample_clip=4, sample_frame=8, final_num_patches=1)


@pytest.fixture(scope="module")
def video():
    return jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3, 8, 96, 160)).astype(np.float32)
    )


def test_retrieval(cfg, video):
    model = LfVilaRetrieval(cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(2, 1000, size=(2, 4, 10)))
    mask = jnp.ones((2, 4, 10), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video, ids, mask)
    out = model.apply(params, video, ids, mask)
    assert out["video_global_feat"].shape == (2, cfg.bert.hidden_size)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["text_global_feat"]), axis=-1), 1.0, rtol=1e-5
    )
    assert np.isfinite(float(out["loss"]))


def test_qa_multichoice(cfg, video):
    model = LfVilaQAMultichoice(cfg)
    rng = np.random.default_rng(2)
    B, n_choice, M, L = 2, 3, 2, 8
    ids = jnp.asarray(rng.integers(2, 1000, size=(B, n_choice, M, L)))
    mask = jnp.ones((B, n_choice, M, L), jnp.int32)
    labels = jnp.asarray([0, 2])
    span_labels = jnp.asarray(rng.integers(0, 2, size=(B, 8)))
    span_w = jnp.ones((B, 8), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), video, ids, mask, labels=labels,
        span_labels=span_labels, span_label_weights=span_w,
    )
    out = model.apply(
        params, video, ids, mask, labels=labels,
        span_labels=span_labels, span_label_weights=span_w,
    )
    assert out["logits"].shape == (B, n_choice)
    assert out["span_prediction"].shape == (B, 8, 2)
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["span_loss"]))


def test_qa_classification(cfg, video):
    model = LfVilaQAClassification(cfg, num_labels=17)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(2, 1000, size=(2, 4, 10)))
    mask = jnp.ones((2, 4, 10), jnp.int32)
    labels = jnp.asarray([3, 16])
    params = model.init(jax.random.PRNGKey(0), video, ids, mask, labels=labels)
    out = model.apply(params, video, ids, mask, labels=labels)
    assert out["logits"].shape == (2, 17)
    assert np.isfinite(float(out["loss"]))


def test_video_classification(cfg, video):
    model = LfVilaVideoClassification(cfg, num_labels=11)
    labels = jnp.asarray([1, 7])
    params = model.init(jax.random.PRNGKey(0), video, labels=labels)
    out = model.apply(params, video, labels=labels)
    assert out["logits"].shape == (2, 11)
    assert np.isfinite(float(out["loss"]))
    assert 0.0 <= float(out["acc"]) <= 1.0
