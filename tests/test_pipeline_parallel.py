"""Pipeline-parallelism parity: pipelined BERT tower ≡ sequential encoder.

The engine (``parallel/pipeline.py``) is a TPU-native extension beyond the
reference's DP-only distribution (SURVEY §2.7): GPipe microbatching with
``ppermute`` stage handoffs over a ``pipe`` mesh axis. These tests assert,
on the 8-device virtual CPU mesh:

- forward parity of the pipelined layer stack vs ``StagedBertEncoder``
  (with and without padding masks, pipe=4 and pipe=2×data=4);
- gradient parity through the pipeline (train-step-shaped loss), checking
  the stacked-gradient slices against per-layer sequential gradients;
- one full optimizer step on a pipelined MLM toy matches the sequential
  step's loss trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpretrain_tpu.models.bert import BertConfig, BertLayer, StagedBertEncoder
from xpretrain_tpu.models.common import expand_padding_mask
from xpretrain_tpu.parallel.mesh import create_mesh
from xpretrain_tpu.parallel.pipeline import (
    make_pipeline,
    pipelined_bert_encoder,
    pipeline_param_shardings,
    stack_layer_params,
    unstack_layer_params,
)

CFG = BertConfig(
    vocab_size=500,
    hidden_size=32,
    num_hidden_layers=4,
    num_attention_heads=4,
    intermediate_size=64,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)


def _encoder_params(rng_seed=0, batch=8, seq=10):
    enc = StagedBertEncoder(CFG)
    hidden = jax.random.normal(jax.random.PRNGKey(1), (batch, seq, CFG.hidden_size))
    params = enc.init(jax.random.PRNGKey(rng_seed), hidden, None)["params"]
    return enc, params, hidden


def _pipe_mesh(pipe=4):
    devices = jax.devices()[:pipe]
    return create_mesh((pipe,), ("pipe",), devices=devices)


def test_stack_unstack_roundtrip():
    _, params, _ = _encoder_params()
    stacked = stack_layer_params(params, CFG.num_hidden_layers)
    back = unstack_layer_params(stacked, CFG.num_hidden_layers)
    for i in range(CFG.num_hidden_layers):
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, back[f"layer_{i}"], params[f"layer_{i}"]
        )


@pytest.mark.parametrize("with_mask", [False, True])
def test_pipeline_forward_matches_sequential(with_mask):
    enc, params, hidden = _encoder_params()
    mask = None
    if with_mask:
        pad = np.ones((hidden.shape[0], hidden.shape[1]), np.int32)
        pad[:, -3:] = 0
        mask = expand_padding_mask(jnp.asarray(pad))
    ref = enc.apply({"params": params}, hidden, mask)

    mesh = _pipe_mesh(4)
    run = pipelined_bert_encoder(CFG, mesh)
    stacked = stack_layer_params(params, CFG.num_hidden_layers)
    got = jax.jit(run)(stacked, hidden, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pipeline_more_microbatches_than_stages():
    enc, params, hidden = _encoder_params()
    mesh = _pipe_mesh(2)
    run = pipelined_bert_encoder(CFG, mesh, n_microbatches=4)
    stacked = stack_layer_params(params, CFG.num_hidden_layers)
    got = jax.jit(run)(stacked, hidden, None)
    ref = enc.apply({"params": params}, hidden, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_pipeline_grad_matches_sequential():
    enc, params, hidden = _encoder_params()
    target = jax.random.normal(jax.random.PRNGKey(3), hidden.shape)
    mesh = _pipe_mesh(4)
    run = pipelined_bert_encoder(CFG, mesh)
    stacked = stack_layer_params(params, CFG.num_hidden_layers)

    def pipe_loss(sp, h):
        return jnp.mean((run(sp, h, None) - target) ** 2)

    def seq_loss(p, h):
        return jnp.mean((enc.apply({"params": p}, h, None) - target) ** 2)

    pipe_l, pipe_g = jax.jit(jax.value_and_grad(pipe_loss))(stacked, hidden)
    seq_l, seq_g = jax.jit(jax.value_and_grad(seq_loss))(params, hidden)
    np.testing.assert_allclose(float(pipe_l), float(seq_l), rtol=1e-5)
    pipe_g_unstacked = unstack_layer_params(pipe_g, CFG.num_hidden_layers)
    for i in range(CFG.num_hidden_layers):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5
            ),
            pipe_g_unstacked[f"layer_{i}"],
            seq_g[f"layer_{i}"],
        )


def test_pipeline_with_data_parallel_mesh():
    """pipe=2 × data=4: batch sharded over data, layers over pipe."""
    enc, params, hidden = _encoder_params(batch=8)
    mesh = create_mesh((4, 2), ("data", "pipe"), devices=jax.devices()[:8])
    run = pipelined_bert_encoder(CFG, mesh, data_axis="data", n_microbatches=2)
    stacked = stack_layer_params(params, CFG.num_hidden_layers)
    stacked = jax.device_put(stacked, pipeline_param_shardings(stacked, mesh))
    got = jax.jit(run)(stacked, hidden, None)
    ref = enc.apply({"params": params}, hidden, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_pipeline_train_step_matches_sequential():
    """One AdamW step on a pipelined MLM-toy ≡ the sequential step."""
    import optax

    enc, params, hidden = _encoder_params()
    labels = jax.random.randint(jax.random.PRNGKey(5), hidden.shape[:2], 0, CFG.vocab_size)
    head = jax.random.normal(
        jax.random.PRNGKey(6), (CFG.hidden_size, CFG.vocab_size)
    ) * 0.02
    mesh = _pipe_mesh(4)
    run = pipelined_bert_encoder(CFG, mesh)
    stacked = stack_layer_params(params, CFG.num_hidden_layers)

    def mlm_loss(out):
        logits = out @ head
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))

    tx = optax.adamw(1e-3, weight_decay=0.01)

    def one_step(loss_fn, p):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, _ = tx.update(grads, tx.init(p), p)
        return loss, optax.apply_updates(p, updates)

    pipe_loss, new_stacked = jax.jit(
        lambda sp: one_step(lambda q: mlm_loss(run(q, hidden, None)), sp)
    )(stacked)
    seq_loss, new_params = jax.jit(
        lambda p: one_step(
            lambda q: mlm_loss(enc.apply({"params": q}, hidden, None)), p
        )
    )(params)
    np.testing.assert_allclose(float(pipe_loss), float(seq_loss), rtol=1e-5)
    new_unstacked = unstack_layer_params(new_stacked, CFG.num_hidden_layers)
    # atol: Adam divides near-zero grads by near-zero sqrt(v), amplifying
    # float32 reduction-order noise toward the lr (1e-3) scale.
    for i in range(CFG.num_hidden_layers):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            new_unstacked[f"layer_{i}"],
            new_params[f"layer_{i}"],
        )


def test_indivisible_layers_raises():
    mesh = _pipe_mesh(4)
    with pytest.raises(ValueError):
        make_pipeline(lambda p, h, m: h, n_layers=6, mesh=mesh)


def test_indivisible_batch_raises():
    mesh = _pipe_mesh(4)
    run = pipelined_bert_encoder(CFG, mesh)
    _, params, _ = _encoder_params()
    stacked = stack_layer_params(params, CFG.num_hidden_layers)
    bad = jnp.zeros((6, 10, CFG.hidden_size))
    with pytest.raises(ValueError):
        run(stacked, bad, None)
