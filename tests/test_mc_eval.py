"""Multiple-choice-by-similarity eval (MSR-VTT MC pattern)."""

import numpy as np

from xpretrain_tpu.train.evaluate import evaluate_multichoice_by_similarity


def test_mc_by_similarity_picks_nearest():
    rng = np.random.default_rng(0)
    B, n_choice, D = 6, 5, 8
    vis = rng.normal(size=(B, D)).astype(np.float32)
    vis /= np.linalg.norm(vis, axis=-1, keepdims=True)
    labels = rng.integers(0, n_choice, size=B)
    txt = rng.normal(size=(B, n_choice, D)).astype(np.float32) * 0.1
    for i, lab in enumerate(labels):
        txt[i, lab] = vis[i]  # correct choice = the video embedding itself

    def eval_step(params, batch):
        return {"vis_features": batch["vis"], "text_features": batch["txt"]}

    report = evaluate_multichoice_by_similarity(
        eval_step,
        None,
        [{"vis": vis, "txt": txt.reshape(B * n_choice, D), "labels": labels}],
    )
    assert report["accuracy"] == 1.0
    assert report["n"] == B


def test_mc_valid_len_trim():
    vis = np.eye(4, 8, dtype=np.float32)
    txt = np.tile(vis[:, None], (1, 2, 1)).reshape(8, 8)
    txt[1::2] = 0  # second choice is null -> argmax picks choice 0
    labels = np.zeros(4, dtype=int)

    def eval_step(params, batch):
        return {"vis_features": batch["vis"], "text_features": batch["txt"]}

    report = evaluate_multichoice_by_similarity(
        eval_step, None,
        [{"vis": vis, "txt": txt, "labels": labels}],
        valid_len=3,
    )
    assert report["n"] == 3
