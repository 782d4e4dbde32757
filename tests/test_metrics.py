import numpy as np

from xpretrain_tpu.utils.metrics import (
    compute_metrics,
    compute_metrics_multi,
    cosine_sim,
    dsl_renormalize,
    np_softmax,
    retrieval_report,
)


def test_perfect_retrieval():
    sim = np.eye(10)
    m = compute_metrics(sim)
    assert m["R1"] == 100.0
    assert m["MedR"] == 1.0
    assert m["MeanR"] == 1.0


def test_known_ranks():
    # query 0 positive ranked 1st; query 1 positive ranked 3rd of 4
    sim = np.array(
        [
            [0.9, 0.1, 0.2, 0.0],
            [0.8, 0.3, 0.5, 0.1],
            [0.0, 0.1, 0.9, 0.2],
            [0.0, 0.1, 0.2, 0.9],
        ]
    )
    m = compute_metrics(sim)
    assert m["R1"] == 75.0
    assert m["R5"] == 100.0
    # ranks (0-indexed): 0, 2, 0, 0 -> MeanR = (1+3+1+1)/4
    assert np.isclose(m["MeanR"], 1.5)


def test_multi_positive():
    sim = np.array([[0.1, 0.9, 0.5], [0.2, 0.3, 0.8], [0.9, 0.1, 0.0]])
    mask = np.array([[1, 1, 0], [0, 0, 1], [1, 0, 0]])
    m = compute_metrics_multi(sim, mask)
    assert m["R1"] == 100.0


def test_dsl_preserves_argmax_of_sharp_sim():
    rng = np.random.default_rng(1)
    sim = rng.normal(size=(20, 20))
    np.fill_diagonal(sim, 5.0)
    m = compute_metrics(dsl_renormalize(sim))
    assert m["R1"] == 100.0


def test_softmax_matches_numpy():
    x = np.random.default_rng(2).normal(size=(5, 7))
    s = np_softmax(x, axis=0, temperature=3.0)
    ref = np.exp(3 * x) / np.exp(3 * x).sum(axis=0, keepdims=True)
    assert np.allclose(s, ref)


def test_report_shape():
    f = np.random.default_rng(3).normal(size=(8, 4))
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    rep = retrieval_report(cosine_sim(f, f))
    assert set(rep) == {"t2v", "v2t", "t2v_dsl", "v2t_dsl"}
    assert rep["t2v"]["R1"] == 100.0
