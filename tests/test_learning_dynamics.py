"""Learning-dynamics tests for HD-VILA and LF-VILA stage-1/stage-2 recipes.

Round-3 verdict #4: the family runner tests assert only *finite* losses; a
miswired ``stop_gradient``, a frozen-stage mistake, or a dead head would pass
them. These tests train each recipe 30-40 steps on a fixed batch and assert

1. the total loss drops materially (the CLIP-ViP analogue is
   ``test_e2e_clipvip.py::test_training_reduces_loss``);
2. every trainable leaf receives a nonzero first-step gradient, except a
   short allowlist of *structurally* dead modules that faithfully mirror the
   reference (each entry cites why);
3. frozen leaves (stage-2 freeze patterns, ref ``hd-vila/src/pretrain/
   run_pretrain_stage2_group.py:138-144`` / ``LF-VILA/src/models/
   lfvila_pretrain.py:82-97``) do not move at all.

Note on learning rates: the tiny HD-VILA stage-1 tower feature-collapses at
lr >= 3e-4 (all visual features become identical, ITC pins at 2*ln B); the
reference trains stage 1 at 5e-5 (``pretrain_stage1.json``). lr=1e-4 here.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from xpretrain_tpu.optim import NO_DECAY_LFVILA, build_optimizer, get_schedule

pytestmark = pytest.mark.slow

# stage-2 freeze sets, mirroring the tiny-preset fixtures in
# test_family_runners.py (full presets: configs/presets/*_stage2.*)
HD_FROZEN = (
    "encoder/cnn", "encoder/grid_encoder", "encoder/timesformer",
    "transformer/t_proj", "transformer/v_proj",
    "bert/embeddings", "pooler1", "layer_0/", "layer_1/",
)
LF_FROZEN = (
    "video_encoder", "sent_embedding", "text_encoder/embeddings",
    "layer_0/", "layer_1/",
)

# Structurally dead leaves that faithfully mirror the reference:
# - LF-VILA local branch: the reference resets ``local_feat = None`` every
#   layer iteration (``LF-VILA/src/models/video_encoder.py:598-607``), so
#   the local projection is dead code; faithful_local_branch=True keeps it
#   (documented at Swin3DConfig.faithful_local_branch).
LF_DEAD_LOCAL = (
    "video_encoder/local_feat_proj/norm/bias",
    "video_encoder/local_feat_proj/norm/scale",
    "video_encoder/local_feat_proj/reduction/kernel",
    "video_encoder/norm_local/bias",
    "video_encoder/norm_local/scale",
)
# - HD-VILA stage 2 computes pooled1 and carries the stage-1 ITC projection
#   heads, but the MLM+ITM loss never consumes them (ref ``modeling_stage.py``
#   stage-2 forward; they are frozen by the stage-2 recipe anyway).
HD_DEAD_STAGE2 = (
    "transformer/bert_model/pooler1/dense/bias",
    "transformer/bert_model/pooler1/dense/kernel",
    "transformer/t_proj/bias",
    "transformer/t_proj/kernel",
    "transformer/v_proj/bias",
    "transformer/v_proj/kernel",
)


def _train_fixed_batch(apply_fn, params, *, n_steps, lr, frozen=(), no_decay=None):
    """AdamW on one fixed batch; returns (losses, first_grads, final_params)."""
    kwargs = {"no_decay_patterns": no_decay} if no_decay is not None else {}
    tx, _ = build_optimizer(
        params, get_schedule("constant", lr, n_steps, warmup_ratio=0.0),
        weight_decay=0.01, frozen_patterns=tuple(frozen), **kwargs,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, rng):
        def loss_fn(q):
            return apply_fn(q, rng)["loss"].astype(jnp.float32)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s2 = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s2, loss, grads

    losses, first_grads = [], None
    for i in range(n_steps):
        params, opt_state, loss, grads = step(params, opt_state, jax.random.PRNGKey(100 + i))
        if first_grads is None:
            first_grads = jax.tree_util.tree_map(np.asarray, grads)
        losses.append(float(loss))
    return losses, first_grads, params


def _zero_grad_paths(grads) -> set[str]:
    flat = flax.traverse_util.flatten_dict(grads, sep="/")
    return {k for k, v in flat.items() if float(np.max(np.abs(v))) == 0.0}


def _assert_learns(losses, tag):
    assert np.isfinite(losses).all(), f"{tag}: non-finite losses {losses}"
    assert losses[-1] < 0.65 * losses[0] and losses[-1] < losses[0] - 1.0, (
        f"{tag}: loss did not drop materially: {losses[0]:.3f} -> {losses[-1]:.3f}"
    )


def _assert_coverage(zeros, allowed, tag):
    unexpected = zeros - set(allowed)
    assert not unexpected, f"{tag}: unexpectedly dead (zero-grad) leaves: {sorted(unexpected)}"


def _assert_frozen_respected(init_params, final_params, frozen, tag):
    flat0 = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, init_params), sep="/"
    )
    flat1 = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, final_params), sep="/"
    )
    n_frozen = n_moved = 0
    for k in flat0:
        if any(p.lower() in k.lower() + "/" for p in frozen):
            n_frozen += 1
            np.testing.assert_array_equal(
                flat0[k], flat1[k], err_msg=f"{tag}: frozen leaf {k} moved"
            )
        elif not np.array_equal(flat0[k], flat1[k]):
            n_moved += 1
    assert n_frozen > 0, f"{tag}: freeze patterns matched no leaves"
    assert n_moved > 0, f"{tag}: no trainable leaf moved"


# ---- HD-VILA ---------------------------------------------------------------


def _hd_setup(stage, use_itm):
    from xpretrain_tpu.cli.run_pretrain_hdvila import HdVilaPretrainModel
    from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoderConfig
    from xpretrain_tpu.models.hd_vila.modeling import HdVilaModelConfig

    enc_cfg = HdVilaEncoderConfig.tiny(timesformer_frames=3, timesformer_hw=(1, 2))
    mcfg = HdVilaModelConfig.tiny(stage=stage, pixel_random_sampling_size=0)
    model = HdVilaPretrainModel(enc_cfg, mcfg, temp=0.05)
    rng = np.random.default_rng(0)
    B, Lt = 8, 12
    batch = dict(
        img_middle=jnp.asarray(rng.integers(0, 255, size=(B, 2, 3, 64, 128)).astype(np.float32)),
        img_other=jnp.asarray(rng.integers(0, 255, size=(B, 2, 2, 3, 16, 32)).astype(np.float32)),
        ids=jnp.asarray(rng.integers(2, 1000, size=(B, Lt)).astype(np.int32)),
        mask=jnp.ones((B, Lt), jnp.int32),
    )
    kwargs = {}
    if stage == 2:
        mlm = np.full((B, Lt), -100, np.int64)
        mlm[:, 3:6] = rng.integers(2, 1000, size=(B, 3))
        kwargs["mlm_labels"] = jnp.asarray(mlm)
        if use_itm:
            itm = np.ones((B,), np.int32)
            itm[: B // 4] = 0
            kwargs["itm_labels"] = jnp.asarray(itm)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["img_middle"][:2], batch["img_other"][:2],
        batch["ids"][:2], batch["mask"][:2],
        **{k: v[:2] for k, v in kwargs.items()},
    )["params"]

    def apply_fn(p, rng):
        extra = dict(kwargs)
        if stage == 2:
            extra["sample_rng"] = rng
        return model.apply(
            {"params": p},
            batch["img_middle"], batch["img_other"], batch["ids"], batch["mask"],
            deterministic=False, rngs={"dropout": rng}, **extra,
        )

    return apply_fn, params


def test_hdvila_stage1_learns_with_full_grad_coverage():
    apply_fn, params = _hd_setup(stage=1, use_itm=False)
    losses, grads, _ = _train_fixed_batch(apply_fn, params, n_steps=40, lr=1e-4)
    _assert_learns(losses, "hdvila_stage1")
    _assert_coverage(_zero_grad_paths(grads), (), "hdvila_stage1")


def test_hdvila_stage2_learns_and_respects_freeze():
    apply_fn, params = _hd_setup(stage=2, use_itm=True)
    losses, grads, final = _train_fixed_batch(
        apply_fn, params, n_steps=30, lr=1e-3, frozen=HD_FROZEN
    )
    _assert_learns(losses, "hdvila_stage2")
    _assert_coverage(_zero_grad_paths(grads), HD_DEAD_STAGE2, "hdvila_stage2")
    _assert_frozen_respected(params, final, HD_FROZEN, "hdvila_stage2")


# ---- LF-VILA ---------------------------------------------------------------


def _lf_setup(stage):
    from xpretrain_tpu.models.lf_vila.pretrain import LfVilaConfig, LfVilaPretrain

    cfg = LfVilaConfig.tiny(stage=stage, sample_clip=4, sample_frame=8)
    model = LfVilaPretrain(cfg)
    rng = np.random.default_rng(1)
    B, M, L = 8, 4, 12
    batch = dict(
        video_frames=jnp.asarray(rng.normal(size=(B, 3, 8, 96, 160)).astype(np.float32)),
        text_ids=jnp.asarray(rng.integers(2, 1000, size=(B, M, L)).astype(np.int32)),
        attention_mask=jnp.ones((B, M, L), jnp.int32),
    )
    kwargs = {}
    if stage == 1:
        kwargs["mtc_rng"] = jax.random.PRNGKey(7)
    else:
        mlm = np.full((B, M * L), -100, np.int64)
        mlm[:, 5:10] = rng.integers(2, 1000, size=(B, 5))
        kwargs["mlm_labels"] = jnp.asarray(mlm)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["video_frames"][:2], batch["text_ids"][:2], batch["attention_mask"][:2],
        **{k: (v[:2] if hasattr(v, "shape") and v.shape[0] == B else v)
           for k, v in kwargs.items()},
    )["params"]

    def apply_fn(p, rng):
        return model.apply(
            {"params": p},
            batch["video_frames"], batch["text_ids"], batch["attention_mask"],
            deterministic=False, rngs={"dropout": rng}, **kwargs,
        )

    return apply_fn, params


def test_lfvila_stage1_learns_with_full_grad_coverage():
    apply_fn, params = _lf_setup(stage=1)
    losses, grads, _ = _train_fixed_batch(
        apply_fn, params, n_steps=40, lr=1e-3, no_decay=NO_DECAY_LFVILA
    )
    _assert_learns(losses, "lfvila_stage1")
    _assert_coverage(_zero_grad_paths(grads), LF_DEAD_LOCAL, "lfvila_stage1")


def test_lfvila_stage2_learns_and_respects_freeze():
    apply_fn, params = _lf_setup(stage=2)
    losses, grads, final = _train_fixed_batch(
        apply_fn, params, n_steps=30, lr=1e-3,
        frozen=LF_FROZEN, no_decay=NO_DECAY_LFVILA,
    )
    _assert_learns(losses, "lfvila_stage2")
    _assert_coverage(
        _zero_grad_paths(grads), LF_DEAD_LOCAL, "lfvila_stage2"
    )
    _assert_frozen_respected(params, final, LF_FROZEN, "lfvila_stage2")
