"""Staged BERT: parity vs HF BertModel, stage splitting, block-local attention."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xpretrain_tpu.models.bert import (  # noqa: E402
    BertConfig,
    BertMLMHead,
    BertPooler,
    StagedBertModel,
    _block_local_mask,
)
from xpretrain_tpu.models.bert_convert import bert_torch_to_flax  # noqa: E402

KW = dict(
    vocab_size=211,
    hidden_size=32,
    num_hidden_layers=4,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=32,
    type_vocab_size=2,
)


pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def hf_bert():
    from transformers import BertConfig as HFBertConfig, BertForPreTraining

    torch.manual_seed(0)
    model = BertForPreTraining(HFBertConfig(**KW)).eval()
    return model


def test_bert_parity_vs_hf(hf_bert):
    cfg = BertConfig(**KW)
    model = StagedBertModel(cfg, with_pooler=True)
    bert_p, pooler_p, mlm_p = bert_torch_to_flax(hf_bert.state_dict())
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 200, size=(2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0
    tt = rng.integers(0, 2, size=(2, 12))

    with torch.no_grad():
        want_seq = hf_bert.bert(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tt),
        )
    params = {"params": {**bert_p, "pooler": pooler_p}}
    got = StagedBertModel(cfg, with_pooler=True).apply(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt)
    )
    np.testing.assert_allclose(
        np.asarray(got), want_seq.last_hidden_state.numpy(), atol=3e-5
    )
    got_pooled = StagedBertModel(cfg, with_pooler=True).apply(
        params, got, method=StagedBertModel.pool
    )
    np.testing.assert_allclose(
        np.asarray(got_pooled), want_seq.pooler_output.numpy(), atol=3e-5
    )

    # MLM head parity
    mlm_head = BertMLMHead(cfg)
    with torch.no_grad():
        want_logits = hf_bert.cls.predictions(want_seq.last_hidden_state).numpy()
    got_logits = mlm_head.apply({"params": mlm_p}, got)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits, atol=3e-4)


def test_stage_composition_equals_full(hf_bert):
    """Running stages 0..2 sequentially == running all layers at once."""
    cfg = BertConfig(**KW, stage_bounds=(1, 3))
    model = StagedBertModel(cfg)
    bert_p, *_ = bert_torch_to_flax(hf_bert.state_dict())
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 200, size=(2, 10)))
    mask = jnp.ones((2, 10), jnp.int32)
    params = {"params": bert_p}
    full = model.apply(params, ids, mask)
    h = model.apply(params, ids, mask, stage=0)
    h = model.apply(params, inputs_embeds=h, attention_mask=mask, stage=1)
    h = model.apply(params, inputs_embeds=h, attention_mask=mask, stage=2)
    np.testing.assert_allclose(np.asarray(h), np.asarray(full), atol=1e-5)


def test_block_local_mask_pattern():
    mask = np.asarray(_block_local_mask(8, 2))[0, 0]
    # token 5 (block 2) sees blocks 1,2,3 and the global block 0
    assert mask[5, 2] == 0 and mask[5, 7] == 0 and mask[5, 0] == 0
    # an 8-token/2-block case has no fully-masked pair except none here; use
    # a longer sequence for an actual exclusion
    mask2 = np.asarray(_block_local_mask(12, 2))[0, 0]
    assert mask2[11, 5] < -1e8  # block 5 cannot see block 2
    assert mask2[11, 0] == 0  # global CLS block always visible


def test_attention_window_runs():
    cfg = BertConfig(**KW, attention_window=4)
    model = StagedBertModel(cfg)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 200, size=(2, 16)))
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()
