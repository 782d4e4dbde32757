"""AOT serving artifacts: export → serialize → load → call parity.

The artifact must reproduce the live model's retrieval features exactly
(same platform, same dtype), serve multiple batch sizes from one export
(symbolic batch dim), and round-trip through the on-disk ``.xpsa`` zip
with no model code on the load path (``xpretrain_tpu.serving``)."""

import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpretrain_tpu.models.clip_vip import CLIPVipConfig, CLIPViPModel
from xpretrain_tpu.serving import (
    RetrievalArtifact,
    export_retrieval_towers,
    load_artifact,
    save_artifact,
)

FRAMES, IMAGE, SEQ = 4, 32, 16


@pytest.fixture(scope="module")
def tiny_model():
    cfg = CLIPVipConfig.tiny_debug(image_size=IMAGE)
    model = CLIPViPModel(cfg)
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((1, FRAMES, IMAGE, IMAGE, 3), jnp.uint8)
    ids = jnp.zeros((1, SEQ), jnp.int32).at[:, 0].set(49406).at[:, 5].set(49407)
    mask = (ids > 0).astype(jnp.int32)
    variables = model.init(rng, video, ids, mask)
    return model, variables


def _batch(rng, b):
    video = rng.integers(0, 255, size=(b, FRAMES, IMAGE, IMAGE, 3)).astype(np.uint8)
    ids = np.zeros((b, SEQ), np.int32)
    ids[:, 0] = 49406
    ids[:, 1:6] = rng.integers(10, 400, size=(b, 5))
    ids[:, 6] = 49407
    mask = (ids > 0).astype(np.int32)
    return jnp.asarray(video), jnp.asarray(ids), jnp.asarray(mask)


@pytest.fixture(scope="module")
def artifact_path(tiny_model, tmp_path_factory):
    model, variables = tiny_model
    art = export_retrieval_towers(
        model, variables, frames=FRAMES, image_size=IMAGE, seq_len=SEQ
    )
    path = str(tmp_path_factory.mktemp("serving") / "clipvip_tiny.xpsa")
    save_artifact(path, art)
    return path


def test_artifact_matches_live_model(tiny_model, artifact_path, rng):
    """Deserialized towers reproduce model.apply exactly (same platform)."""
    model, variables = tiny_model
    art = load_artifact(artifact_path)
    video, ids, mask = _batch(rng, 3)

    want_v = model.apply(variables, video, method=CLIPViPModel.forward_video)
    want_t = model.apply(variables, ids, mask, method=CLIPViPModel.forward_text)
    got_v = art.encode_video(video)
    got_t = art.encode_text(ids, mask)

    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), atol=1e-6)
    # features are L2-normalized — the serving contract for plain-matmul ranking
    np.testing.assert_allclose(np.linalg.norm(np.asarray(got_v), axis=-1), 1.0, atol=1e-5)


def test_symbolic_batch_serves_multiple_sizes(artifact_path, rng):
    """One export serves any batch size (symbolic 'b' dim)."""
    art = load_artifact(artifact_path)
    for b in (1, 2, 5):
        video, ids, mask = _batch(rng, b)
        assert art.encode_video(video).shape == (b, art.meta["projection_dim"])
        assert art.encode_text(ids, mask).shape == (b, art.meta["projection_dim"])


def test_batch_independence(artifact_path, rng):
    """Row i of a batched call equals the single-item call (no cross-batch mixing)."""
    art = load_artifact(artifact_path)
    video, ids, mask = _batch(rng, 4)
    full = np.asarray(art.encode_video(video))
    one = np.asarray(art.encode_video(video[2:3]))
    np.testing.assert_allclose(full[2:3], one, atol=1e-6)


def test_meta_and_similarity(tiny_model, artifact_path, rng):
    model, variables = tiny_model
    art = load_artifact(artifact_path)
    meta = art.meta
    assert meta["family"] == "clip_vip"
    assert (meta["frames"], meta["image_size"], meta["seq_len"]) == (FRAMES, IMAGE, SEQ)
    assert meta["video_dtype"] == "uint8"
    np.testing.assert_allclose(
        meta["logit_scale"], float(variables["params"]["logit_scale"]), rtol=1e-6
    )
    video, ids, mask = _batch(rng, 3)
    t = art.encode_text(ids, mask)
    v = art.encode_video(video)
    scores = np.asarray(art.similarity(t, v))
    assert scores.shape == (3, 3)
    scaled = np.asarray(art.similarity(t, v, scaled=True))
    np.testing.assert_allclose(scaled, scores * np.exp(meta["logit_scale"]), rtol=1e-5)


def test_zip_layout_and_bad_file_error(artifact_path, tmp_path):
    with zipfile.ZipFile(artifact_path) as zf:
        names = set(zf.namelist())
        assert {"video.jaxexp", "text.jaxexp", "meta.json"} <= names
        meta = json.loads(zf.read("meta.json"))
        assert meta["format_version"] == 1
    bogus = tmp_path / "bogus.xpsa"
    with zipfile.ZipFile(bogus, "w") as zf:
        zf.writestr("meta.json", "{}")
    with pytest.raises(ValueError, match="not a serving artifact"):
        load_artifact(str(bogus))


def test_future_format_version_rejected(artifact_path, tmp_path):
    newer = tmp_path / "newer.xpsa"
    with zipfile.ZipFile(artifact_path) as src, zipfile.ZipFile(newer, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name == "meta.json":
                meta = json.loads(data)
                meta["format_version"] = 99
                data = json.dumps(meta).encode()
            dst.writestr(name, data)
    with pytest.raises(ValueError, match="newer than"):
        load_artifact(str(newer))


def test_cli_exporter_writes_loadable_artifact(tmp_path, rng):
    """python -m xpretrain_tpu.cli.export_serving_clipvip end-to-end (tiny)."""
    from xpretrain_tpu.cli.export_serving_clipvip import main

    out = str(tmp_path / "tiny.xpsa")
    meta = main([
        "--clip_size", "tiny", "--crop_img_size", str(IMAGE),
        "--num_frm", str(FRAMES), "--max_txt_len", str(SEQ),
        "--bf16", "0", "--output", out, "--output_dir", str(tmp_path / "out"),
    ])
    assert meta["projection_dim"] > 0
    art = load_artifact(out)
    video, ids, mask = _batch(rng, 2)
    assert art.encode_video(video).shape == (2, meta["projection_dim"])
    assert art.encode_text(ids, mask).shape == (2, meta["projection_dim"])


def test_fp32_channel_first_export(tiny_model, rng):
    """The fp path exports the torch-layout [B,T,C,H,W] input convention."""
    model, variables = tiny_model
    art = export_retrieval_towers(
        model, variables, frames=FRAMES, image_size=IMAGE, seq_len=SEQ,
        video_dtype=jnp.float32,
    )
    video = jnp.asarray(rng.normal(size=(2, FRAMES, 3, IMAGE, IMAGE)).astype(np.float32))
    want = model.apply(variables, video, method=CLIPViPModel.forward_video)
    np.testing.assert_allclose(
        np.asarray(art.encode_video(video)), np.asarray(want), atol=1e-6
    )
