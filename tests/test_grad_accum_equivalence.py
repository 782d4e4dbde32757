"""Gradient-accumulation trajectory equivalence for the HD-VILA stage-2 recipe.

Round-3 verdict #5: the reference trains HD-VILA stage 2 at batch 16/chip
(``hd-vila/src/configs/pretrain_stage2.json:43``); on this environment's v5e
the b=16 step dies in a reproducible ``tpu_compile_helper`` infra crash, so
the production stand-in is 2 microbatches of 8 with ``--gradient_accumulation
_steps 2`` (optax.MultiSteps, mean-of-microbatch grads). This test proves the
stand-in is the *same trajectory*, not an approximation: on CPU, where the
true b=16 step compiles, `k` optimizer steps of the accumulated 2x8 recipe
land on the same parameters as `k` true b=16 steps.

Exactness conditions (all hold for the stage-2 recipe):
- the MLM loss normalizes by masked-position count (``ops/losses.py:218``),
  so microbatch grads average to the full-batch grad when the microbatches
  carry equal mask counts — fixed-span masks here; 15% per example in
  expectation in the real collator;
- no cross-example coupling: stage 2 is MLM over per-example fusion
  (use_itm=0 in the reference recipe), FrozenBN (no batch stats), and the
  in-batch-negative ITC heads are stage-1 only;
- clipping/decay/AdamW run *after* averaging (MultiSteps wraps the whole
  chain), identical to clipping the full-batch grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from xpretrain_tpu.optim import build_optimizer, get_schedule

pytestmark = pytest.mark.slow

HD_FROZEN = (
    "encoder/cnn", "encoder/grid_encoder", "encoder/timesformer",
    "transformer/t_proj", "transformer/v_proj",
    "bert/embeddings", "pooler1", "layer_0/", "layer_1/",
)


def _stage2_setup(B=16, Lt=12):
    from xpretrain_tpu.cli.run_pretrain_hdvila import HdVilaPretrainModel
    from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoderConfig
    from xpretrain_tpu.models.hd_vila.modeling import HdVilaModelConfig

    enc_cfg = HdVilaEncoderConfig.tiny(timesformer_frames=3, timesformer_hw=(1, 2))
    mcfg = HdVilaModelConfig.tiny(stage=2, pixel_random_sampling_size=0)
    model = HdVilaPretrainModel(enc_cfg, mcfg, temp=0.05)
    rng = np.random.default_rng(0)
    mlm = np.full((B, Lt), -100, np.int64)
    mlm[:, 3:6] = rng.integers(2, 1000, size=(B, 3))  # equal mask count/example
    batch = dict(
        img_middle=jnp.asarray(rng.integers(0, 255, size=(B, 2, 3, 64, 128)).astype(np.float32)),
        img_other=jnp.asarray(rng.integers(0, 255, size=(B, 2, 2, 3, 16, 32)).astype(np.float32)),
        ids=jnp.asarray(rng.integers(2, 1000, size=(B, Lt)).astype(np.int32)),
        mask=jnp.ones((B, Lt), jnp.int32),
        mlm_labels=jnp.asarray(mlm),
    )
    params = model.init(
        jax.random.PRNGKey(0),
        batch["img_middle"][:2], batch["img_other"][:2],
        batch["ids"][:2], batch["mask"][:2], mlm_labels=batch["mlm_labels"][:2],
    )["params"]

    def loss_fn(p, b):
        out = model.apply(
            {"params": p}, b["img_middle"], b["img_other"], b["ids"], b["mask"],
            mlm_labels=b["mlm_labels"], deterministic=True,
            sample_rng=jax.random.PRNGKey(7),
        )
        return out["loss"].astype(jnp.float32)

    return loss_fn, params, batch


def _slice(batch, lo, hi):
    return {k: v[lo:hi] for k, v in batch.items()}


def _leaves32(tree):
    return [np.asarray(x, np.float32) for x in jax.tree_util.tree_leaves(tree)]


def test_hdvila_stage2_accum_2x8_matches_true_b16():
    loss_fn, params, batch = _stage2_setup(B=16)
    # the stage-2 recipe's optimizer (pretrain_stage2.json: lr 5e-5, wd 1e-3,
    # clip 5.0, frozen stage-1 modules); constant lr isolates the accum math
    mk = lambda accum: build_optimizer(
        params, get_schedule("constant", 5e-5, 100, warmup_ratio=0.0),
        weight_decay=1e-3, max_grad_norm=5.0, frozen_patterns=HD_FROZEN,
        grad_accum_steps=accum,
    )[0]
    tx_full, tx_acc = mk(1), mk(2)

    def make_step(tx):
        @jax.jit
        def step(p, s, b):
            loss, grads = jax.value_and_grad(loss_fn)(p, b)
            updates, s2 = tx.update(grads, s, p)
            return optax.apply_updates(p, updates), s2, loss

        return step

    step_full, step_acc = make_step(tx_full), make_step(tx_acc)

    p_full, s_full = params, tx_full.init(params)
    p_acc, s_acc = params, tx_acc.init(params)
    for k in range(3):
        p_full, s_full, loss_full = step_full(p_full, s_full, batch)
        p_before = _leaves32(p_acc)
        p_acc, s_acc, l1 = step_acc(p_acc, s_acc, _slice(batch, 0, 8))
        # microbatch 1 must not move params (MultiSteps mid-accumulation)
        for a, b in zip(_leaves32(p_acc), p_before):
            np.testing.assert_array_equal(a, b)
        p_acc, s_acc, l2 = step_acc(p_acc, s_acc, _slice(batch, 8, 16))
        # equal mask counts => mean of microbatch losses == full-batch loss
        np.testing.assert_allclose(
            (float(l1) + float(l2)) / 2, float(loss_full), rtol=2e-5,
            err_msg=f"step {k}: microbatch-mean loss != b=16 loss",
        )
    # trajectory equivalence: same params after 3 optimizer steps
    for a, b in zip(_leaves32(p_acc), _leaves32(p_full)):
        np.testing.assert_allclose(
            a, b, rtol=3e-4, atol=2e-6,
            err_msg="accumulated 2x8 trajectory diverged from true b=16",
        )
