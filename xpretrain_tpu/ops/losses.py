"""Contrastive-loss zoo as pure JAX functions.

Capability parity with the reference loss zoo
(``CLIP-ViP/src/optimization/loss.py:22-328`` and the
Triplet/NCE/HardNeg/MILNCE subset in ``hd-vila/src/optimization/loss.py``).
Every function is pure: ``(features..., logit_scale|temp) -> scalar`` in
fp32, ready to sit inside a pjit-ed train step where the features are
already the post-``all_gather`` global batch (§2.7 of SURVEY.md).

Conventions:

- features arrive L2-normalized (the models normalize before projection
  output, as the reference does inside ``CLIPModel.forward``);
- ``logit_scale`` is the *log*-space learnable temperature; it is
  exponentiated here, matching ``temp.exp()`` in the reference;
- cross-entropies are means over the batch, and the total is the sum of the
  directional terms (PyTorch's ``F.cross_entropy`` reduction semantics).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _xent(logits: Array, labels: Array) -> Array:
    """Mean softmax cross-entropy with integer labels, fp32 accumulation."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - gold)


def _sym_nce(sim: Array) -> Array:
    """Symmetric InfoNCE over a scaled similarity matrix with diagonal labels."""
    labels = jnp.arange(sim.shape[0])
    return _xent(sim, labels) + _xent(sim.T, labels)


# ---------------------------------------------------------------------------
# Fixed-temperature losses
# ---------------------------------------------------------------------------


def nce_loss(vis_feat: Array, text_feat: Array, temp: float = 0.05) -> Array:
    """``NCEContrastiveLoss``: symmetric InfoNCE at fixed temperature."""
    sim = (vis_feat @ text_feat.T) / temp
    return _sym_nce(sim)


def triplet_loss(
    im: Array,
    s: Array,
    margin: float = 0.2,
    max_violation: bool = False,
) -> Array:
    """``TripletContrastiveLoss``: margin ranking over both directions."""
    scores = (im @ s.T).astype(jnp.float32)
    diag = jnp.diagonal(scores)
    cost_s = jnp.clip(margin + scores - diag[:, None], min=0.0)
    cost_im = jnp.clip(margin + scores - diag[None, :], min=0.0)
    eye = jnp.eye(scores.shape[0], dtype=bool)
    cost_s = jnp.where(eye, 0.0, cost_s)
    cost_im = jnp.where(eye, 0.0, cost_im)
    if max_violation:
        return jnp.sum(jnp.max(cost_s, axis=1)) + jnp.sum(jnp.max(cost_im, axis=0))
    return jnp.sum(cost_s) + jnp.sum(cost_im)


def hard_neg_loss(vis_feat: Array, text_feat: Array, hard_negative_num: int = 16) -> Array:
    """``HardNegLoss``: positives vs the top-k hardest in-batch negatives."""
    sim = (text_feat @ vis_feat.T).astype(jnp.float32)
    bsz = sim.shape[0]
    eye = jnp.eye(bsz, dtype=sim.dtype)
    masked = sim - 10000.0 * eye
    hard_t2v = jax.lax.top_k(masked, hard_negative_num)[0]
    hard_v2t = jax.lax.top_k(masked.T, hard_negative_num)[0]
    pos = jnp.diagonal(sim)[:, None]
    sample_t2v = jnp.concatenate([pos, hard_t2v], axis=-1)
    sample_v2t = jnp.concatenate([pos, hard_v2t], axis=-1)
    labels = jnp.zeros((bsz,), dtype=jnp.int32)
    return _xent(sample_t2v, labels) + _xent(sample_v2t, labels)


def milnce_loss(video_embd: Array, text_embd: Array, temp: float = 0.05) -> Array:
    """``MILNCEContrastiveLoss``: multiple candidate texts per video.

    ``text_embd`` holds ``k`` candidates per video, row-major
    ``[B*k, D]``; the positive set for video ``i`` is its own ``k``
    candidates (log-sum-exp pooled).
    """
    b = video_embd.shape[0]
    x = (video_embd @ text_embd.T).astype(jnp.float32) / temp
    x = x.reshape(b, b, -1)  # [B, B, k]
    k = x.shape[-1]
    nominator = jax.nn.logsumexp(jnp.diagonal(x, axis1=0, axis2=1).T, axis=1)  # [B]
    eye = np.eye(b, dtype=bool)  # static mask: shape stays static under jit
    # off-diagonal rows of x, per query: [B, B-1, k]
    off_diag = x[~eye].reshape(b, b - 1, k)
    denominator = jnp.concatenate([off_diag, jnp.transpose(x, (1, 0, 2))], axis=1).reshape(b, -1)
    denominator = jax.nn.logsumexp(denominator, axis=1)
    return jnp.mean(denominator - nominator)


# ---------------------------------------------------------------------------
# Learnable-temperature losses (logit_scale is log-space)
# ---------------------------------------------------------------------------


def nce_learnable_temp(vis_feat: Array, text_feat: Array, logit_scale: Array) -> Array:
    """``NCELearnableTempLoss``: CLIP's symmetric InfoNCE."""
    sim = (vis_feat @ text_feat.T) * jnp.exp(logit_scale)
    return _sym_nce(sim)


def nce_learnable_temp_dsl(vis_feat: Array, text_feat: Array, logit_scale: Array) -> Array:
    """``NCELearnableTempDSLLoss``: dual-softmax reweighting inside the loss."""
    sim = ((vis_feat @ text_feat.T) * jnp.exp(logit_scale)).astype(jnp.float32)
    t2v = sim * jax.nn.softmax(sim, axis=0)
    v2t = sim.T * jax.nn.softmax(sim.T, axis=0)
    labels = jnp.arange(sim.shape[0])
    return _xent(t2v, labels) + _xent(v2t, labels)


def vid_img_nce_learnable_temp(
    vis_feat: Array, text_feat: Array, img_feat: Array, cap_feat: Array, logit_scale: Array
) -> Array:
    """``VidImgNCELearnableTempLoss``: concat video+image batches, one InfoNCE."""
    vis = jnp.concatenate([vis_feat, img_feat], axis=0)
    txt = jnp.concatenate([text_feat, cap_feat], axis=0)
    return nce_learnable_temp(vis, txt, logit_scale)


def vid_img_divide_nce_learnable_temp(
    vis_feat: Array, text_feat: Array, img_feat: Array, cap_feat: Array, logit_scale: Array
) -> Array:
    """``VidImgDivideNCELearnableTempLoss``: separate video and image InfoNCEs."""
    return nce_learnable_temp(vis_feat, text_feat, logit_scale) + nce_learnable_temp(
        img_feat, cap_feat, logit_scale
    )


def nce_learnable_temp_vs_vc(
    vis_feat: Array, text_feat: Array, img_feat: Array, cap_feat: Array, logit_scale: Array
) -> Array:
    """``NCELearnableTempLoss_vs_vc``: video-subtitle + video-caption InfoNCEs."""
    return nce_learnable_temp(vis_feat, text_feat, logit_scale) + nce_learnable_temp(
        vis_feat, cap_feat, logit_scale
    )


def nce_learnable_temp_vs_vc_fc(
    vis_feat: Array, text_feat: Array, img_feat: Array, cap_feat: Array, logit_scale: Array
) -> Array:
    """``NCELearnableTempLoss_vs_vc_fc``: + frame-caption InfoNCE."""
    return nce_learnable_temp_vs_vc(
        vis_feat, text_feat, img_feat, cap_feat, logit_scale
    ) + nce_learnable_temp(img_feat, cap_feat, logit_scale)


def _vsc_terms(
    vis_feat: Array, text_feat: Array, cap_feat: Array, logit_scale: Array
) -> Array:
    """Shared-negative-pool terms of the ``vsc`` losses.

    v2t rows pool the in-batch negatives of BOTH the subtitle and the caption
    similarity matrices (the positive column first), while the two t2v
    directions stay standard diagonal InfoNCEs — matching
    ``NCELearnableTempLoss_vsc`` exactly.
    """
    scale = jnp.exp(logit_scale)
    v2t = ((vis_feat @ text_feat.T) * scale).astype(jnp.float32)
    v2t_2 = ((vis_feat @ cap_feat.T) * scale).astype(jnp.float32)
    b = v2t.shape[0]
    labels = jnp.arange(b)
    eye = np.eye(b, dtype=bool)  # static mask: shape stays static under jit
    v2t_pos = jnp.diagonal(v2t)[:, None]
    v2t_neg = v2t[~eye].reshape(b, b - 1)
    v2t_pos_2 = jnp.diagonal(v2t_2)[:, None]
    v2t_neg_2 = v2t_2[~eye].reshape(b, b - 1)
    pooled = jnp.concatenate([v2t_pos, v2t_neg, v2t_neg_2], axis=1)
    pooled_2 = jnp.concatenate([v2t_pos_2, v2t_neg, v2t_neg_2], axis=1)
    zero_labels = jnp.zeros((b,), dtype=jnp.int32)
    return (
        _xent(v2t.T, labels)
        + _xent(v2t_2.T, labels)
        + _xent(pooled, zero_labels)
        + _xent(pooled_2, zero_labels)
    )


def nce_learnable_temp_vsc(
    vis_feat: Array, text_feat: Array, img_feat: Array, cap_feat: Array, logit_scale: Array
) -> Array:
    """``NCELearnableTempLoss_vsc``: video-(sub,cap) with shared negative pool."""
    return _vsc_terms(vis_feat, text_feat, cap_feat, logit_scale)


def nce_learnable_temp_vsc_fc(
    vis_feat: Array, text_feat: Array, img_feat: Array, cap_feat: Array, logit_scale: Array
) -> Array:
    """``NCELearnableTempLoss_vsc_fc``: the pretrain default — vsc + frame-cap."""
    return _vsc_terms(vis_feat, text_feat, cap_feat, logit_scale) + nce_learnable_temp(
        img_feat, cap_feat, logit_scale
    )


# ---------------------------------------------------------------------------
# Masked-modeling / matching heads (HD-VILA, LF-VILA)
# ---------------------------------------------------------------------------


def mlm_loss(logits: Array, labels: Array, ignore_index: int = -100) -> Array:
    """Masked-LM cross-entropy averaged over non-ignored positions."""
    logits = logits.astype(jnp.float32)
    vocab = logits.shape[-1]
    flat_logits = logits.reshape(-1, vocab)
    flat_labels = labels.reshape(-1)
    valid = flat_labels != ignore_index
    safe_labels = jnp.where(valid, flat_labels, 0)
    logz = jax.nn.logsumexp(flat_logits, axis=-1)
    gold = jnp.take_along_axis(flat_logits, safe_labels[:, None], axis=-1)[:, 0]
    per_tok = jnp.where(valid, logz - gold, 0.0)
    return jnp.sum(per_tok) / jnp.maximum(jnp.sum(valid), 1)


def itm_loss(logits: Array, labels: Array) -> Array:
    """Image/video-text matching binary cross-entropy (2-way logits)."""
    return _xent(logits.astype(jnp.float32), labels)


def label_smoothing_xent(logits: Array, labels: Array, smoothing: float = 0.1) -> Array:
    """Label-smoothed cross-entropy (LF-VILA open-ended QA head,
    ``LF-VILA/src/models/text_encoder.py:311-314``)."""
    logits = logits.astype(jnp.float32)
    n = logits.shape[-1]
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logprobs, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def _masked_xent_flat(logits: Array, labels: Array, ignore_index: int = -100) -> Array:
    """Mean CE over rows whose label != ignore_index (torch CrossEntropyLoss)."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
    per = jnp.where(valid, logz - gold, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(valid), 1)


def mtc_loss(
    video_local_feat: Array,  # [B, M, C], L2-normalized clip-level features
    text_local_feat: Array,  # [B, M, C]
    rng: Array,
    num_key: int = 2,
    num_value: int = 2,
    num_other_neg: int = 3,
    temp: float = 0.05,
    indices: tuple | None = None,  # optional (key_idx, value_idx, other_idx) override
) -> Array:
    """Multimodal Temporal Contrastive loss (LF-VILA's ``ct_time_loss``,
    ref ``LF-VILA/src/models/lfvila_pretrain.py:111-151``).

    Random key clips from one modality are matched against random value clips
    of the other; the label is the temporally nearest value clip, exact
    first-vs-last ties are masked with -100, and ``num_other_neg`` rolled
    cross-batch clips extend the negative pool (including, faithfully, the
    un-rolled sample itself at shift 0).
    """
    b, m, _ = video_local_feat.shape
    k_key, k_value, k_other = jax.random.split(rng, 3)

    def perms(key, count):
        return jax.vmap(lambda kk: jax.random.permutation(kk, m))(jax.random.split(key, b))[
            :, :count
        ]

    if indices is not None:
        key_idx, value_idx, forced_other = indices
    else:
        key_idx = perms(k_key, num_key)  # [B, nk]
        value_idx = perms(k_value, num_value)  # [B, nv]
        forced_other = None

    gather = lambda feats, idx: jnp.take_along_axis(feats, idx[..., None], axis=1)
    text_key = gather(text_local_feat, key_idx)
    video_value = gather(video_local_feat, value_idx)
    video_key = gather(video_local_feat, key_idx)
    text_value = gather(text_local_feat, value_idx)

    if num_other_neg > 0:
        other_idx = forced_other if forced_other is not None else perms(k_other, 1)[:, 0]  # [B]
        vid_other = jnp.take_along_axis(video_local_feat, other_idx[:, None, None], axis=1)[:, 0]
        txt_other = jnp.take_along_axis(text_local_feat, other_idx[:, None, None], axis=1)[:, 0]
        vid_neg = jnp.stack([jnp.roll(vid_other, x, axis=0) for x in range(num_other_neg)], axis=1)
        txt_neg = jnp.stack([jnp.roll(txt_other, x, axis=0) for x in range(num_other_neg)], axis=1)
        video_value = jnp.concatenate([video_value, vid_neg], axis=1)
        text_value = jnp.concatenate([text_value, txt_neg], axis=1)

    sim_t2v = jnp.einsum("bkc,bvc->bkv", text_key, video_value).reshape(b * num_key, -1) / temp
    sim_v2t = jnp.einsum("bkc,bvc->bkv", video_key, text_value).reshape(b * num_key, -1) / temp

    minus = jnp.abs(value_idx[:, None, :] - key_idx[:, :, None])  # [B, nk, nv]
    labels = jnp.argmin(minus, axis=-1).reshape(-1)
    ties = (minus[:, :, 0] == minus[:, :, -1]).reshape(-1)
    labels = jnp.where(ties, -100, labels)

    return _masked_xent_flat(sim_t2v, labels) + _masked_xent_flat(sim_v2t, labels)


# ---------------------------------------------------------------------------
# Registry — reference class names map to (fn, signature kind)
# ---------------------------------------------------------------------------

# signature kinds: "pair_temp" (vis, text, temp), "pair_scale" (vis, text,
# logit_scale), "quad_scale" (vis, text, img, cap, logit_scale)
LOSS_REGISTRY: dict[str, tuple[Callable, str]] = {
    "NCEContrastiveLoss": (nce_loss, "pair_temp"),
    "TripletContrastiveLoss": (triplet_loss, "pair_temp"),
    "HardNegLoss": (hard_neg_loss, "pair_temp"),
    "MILNCEContrastiveLoss": (milnce_loss, "pair_temp"),
    "NCELearnableTempLoss": (nce_learnable_temp, "pair_scale"),
    "NCELearnableTempDSLLoss": (nce_learnable_temp_dsl, "pair_scale"),
    "VidImgNCELearnableTempLoss": (vid_img_nce_learnable_temp, "quad_scale"),
    "VidImgDivideNCELearnableTempLoss": (vid_img_divide_nce_learnable_temp, "quad_scale"),
    "NCELearnableTempLoss_vs_vc": (nce_learnable_temp_vs_vc, "quad_scale"),
    "NCELearnableTempLoss_vs_vc_fc": (nce_learnable_temp_vs_vc_fc, "quad_scale"),
    "NCELearnableTempLoss_vsc": (nce_learnable_temp_vsc, "quad_scale"),
    "NCELearnableTempLoss_vsc_fc": (nce_learnable_temp_vsc_fc, "quad_scale"),
}


def build_loss_fn(loss_name: str, **static_kwargs):
    """Look up a loss by its reference class name; returns a pure function.

    Static kwargs (temp, margin, hard_negative_num, ...) are bound here so
    the returned callable takes only arrays — jit-friendly.
    """
    if loss_name not in LOSS_REGISTRY:
        raise KeyError(f"unknown loss {loss_name!r}; known: {sorted(LOSS_REGISTRY)}")
    fn, kind = LOSS_REGISTRY[loss_name]
    if static_kwargs:
        import functools

        fn = functools.partial(fn, **static_kwargs)
    fn.signature_kind = kind  # type: ignore[attr-defined]
    return fn
