import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpretrain_tpu.ops import losses


def _feats(rng, n=8, d=16, normalize=True):
    f = rng.normal(size=(n, d)).astype(np.float32)
    if normalize:
        f /= np.linalg.norm(f, axis=-1, keepdims=True)
    return jnp.asarray(f)


def _np_xent(logits, labels):
    logits = np.asarray(logits, dtype=np.float64)
    z = logits - logits.max(axis=-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=-1, keepdims=True))
    return float(-logp[np.arange(len(labels)), labels].mean())


def test_nce_matches_numpy(rng):
    v, t = _feats(rng), _feats(rng)
    temp = 0.07
    got = float(losses.nce_loss(v, t, temp))
    sim = np.asarray(v) @ np.asarray(t).T / temp
    want = _np_xent(sim, np.arange(8)) + _np_xent(sim.T, np.arange(8))
    assert np.isclose(got, want, rtol=1e-5)


def test_learnable_temp_equals_fixed_at_same_scale(rng):
    v, t = _feats(rng), _feats(rng)
    logit_scale = jnp.asarray(np.log(1 / 0.07), dtype=jnp.float32)
    got = float(losses.nce_learnable_temp(v, t, logit_scale))
    want = float(losses.nce_loss(v, t, 0.07))
    assert np.isclose(got, want, rtol=1e-5)


def test_triplet_loss_zero_when_separated(rng):
    # identical vis/text, diagonal dominates by construction
    f = jnp.asarray(np.eye(6, 16, dtype=np.float32))
    assert float(losses.triplet_loss(f, f, margin=0.2)) == 0.0


def test_triplet_loss_positive_when_violated(rng):
    v, t = _feats(rng), _feats(rng)
    assert float(losses.triplet_loss(v, t, margin=0.5)) > 0.0
    assert float(losses.triplet_loss(v, t, margin=0.5, max_violation=True)) > 0.0


def test_hard_neg_loss_runs(rng):
    v, t = _feats(rng), _feats(rng)
    val = float(losses.hard_neg_loss(v, t, hard_negative_num=3))
    assert np.isfinite(val) and val > 0


def test_milnce_reduces_to_nce_like_for_k1(rng):
    v, t = _feats(rng, 6), _feats(rng, 6)
    val = float(losses.milnce_loss(v, t, temp=0.1))
    assert np.isfinite(val)
    # k=1: nominator = diag, denominator pools off-diag rows + full columns
    x = np.asarray(v, dtype=np.float64) @ np.asarray(t, dtype=np.float64).T / 0.1
    b = x.shape[0]
    nom = np.diagonal(x)
    eye = np.eye(b, dtype=bool)
    denom_rows = []
    for i in range(b):
        pool = np.concatenate([x[i][~eye[i]], x[:, i]])
        denom_rows.append(np.log(np.exp(pool).sum()))
    want = float(np.mean(np.asarray(denom_rows) - nom))
    assert np.isclose(val, want, rtol=1e-5)


def test_vsc_fc_structure(rng):
    v, t, im, c = _feats(rng), _feats(rng), _feats(rng), _feats(rng)
    scale = jnp.asarray(2.0)
    vsc = float(losses.nce_learnable_temp_vsc(v, t, im, c, scale))
    vsc_fc = float(losses.nce_learnable_temp_vsc_fc(v, t, im, c, scale))
    fc_term = float(losses.nce_learnable_temp(im, c, scale))
    assert np.isclose(vsc_fc, vsc + fc_term, rtol=1e-5)


def test_vsc_shared_negative_pool(rng):
    """v2t rows must pool negatives from BOTH sub and cap matrices."""
    v, t, c = _feats(rng), _feats(rng), _feats(rng)
    scale = jnp.asarray(0.0)
    got = float(losses.nce_learnable_temp_vsc(v, t, jnp.zeros_like(v), c, scale))
    sim_s = np.asarray(v, dtype=np.float64) @ np.asarray(t, dtype=np.float64).T
    sim_c = np.asarray(v, dtype=np.float64) @ np.asarray(c, dtype=np.float64).T
    b = sim_s.shape[0]
    eye = np.eye(b, dtype=bool)
    neg_s = sim_s[~eye].reshape(b, b - 1)
    neg_c = sim_c[~eye].reshape(b, b - 1)
    pooled_s = np.concatenate([np.diagonal(sim_s)[:, None], neg_s, neg_c], axis=1)
    pooled_c = np.concatenate([np.diagonal(sim_c)[:, None], neg_s, neg_c], axis=1)
    zeros = np.zeros(b, dtype=int)
    want = (
        _np_xent(sim_s.T, np.arange(b))
        + _np_xent(sim_c.T, np.arange(b))
        + _np_xent(pooled_s, zeros)
        + _np_xent(pooled_c, zeros)
    )
    assert np.isclose(got, want, rtol=1e-5)


def test_mlm_loss_ignores_unmasked():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 11)).astype(np.float32))
    labels = jnp.full((2, 5), -100, dtype=jnp.int32)
    labels = labels.at[0, 1].set(3)
    val = float(losses.mlm_loss(logits, labels))
    want = _np_xent(np.asarray(logits)[0, 1][None], np.asarray([3]))
    assert np.isclose(val, want, rtol=1e-5)
    # all ignored -> zero, not NaN
    all_ignored = jnp.full((2, 5), -100, dtype=jnp.int32)
    assert float(losses.mlm_loss(logits, all_ignored)) == 0.0


def test_label_smoothing_xent():
    logits = jnp.asarray([[10.0, 0.0, 0.0]])
    labels = jnp.asarray([0])
    plain = float(losses.label_smoothing_xent(logits, labels, smoothing=0.0))
    smoothed = float(losses.label_smoothing_xent(logits, labels, smoothing=0.1))
    assert smoothed > plain


def test_registry_covers_reference_names():
    ref_names = {
        "TripletContrastiveLoss",
        "NCEContrastiveLoss",
        "HardNegLoss",
        "MILNCEContrastiveLoss",
        "NCELearnableTempLoss",
        "VidImgNCELearnableTempLoss",
        "VidImgDivideNCELearnableTempLoss",
        "NCELearnableTempDSLLoss",
        "NCELearnableTempLoss_vs_vc",
        "NCELearnableTempLoss_vs_vc_fc",
        "NCELearnableTempLoss_vsc",
        "NCELearnableTempLoss_vsc_fc",
    }
    assert ref_names <= set(losses.LOSS_REGISTRY)
    fn = losses.build_loss_fn("NCELearnableTempLoss_vsc_fc")
    assert fn.signature_kind == "quad_scale"


def test_losses_jit_and_grad(rng):
    v, t, im, c = _feats(rng), _feats(rng), _feats(rng), _feats(rng)

    @jax.jit
    def loss_and_grad(v, t, im, c, scale):
        return jax.value_and_grad(losses.nce_learnable_temp_vsc_fc, argnums=4)(
            v, t, im, c, scale
        )

    val, g = loss_and_grad(v, t, im, c, jnp.asarray(1.0))
    assert np.isfinite(float(val))
    assert np.isfinite(float(g))
