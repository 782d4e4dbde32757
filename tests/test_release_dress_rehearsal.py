"""Release-day dress rehearsal: full retrieval CLI from a released-format
checkpoint file + real-format BPE assets to an R@K report.

Round-2 verdict #4: the converter was proven on a byte-identical-format
synthetic checkpoint, but no test drove the FULL CLI
(``run_retrieval_clipvip --mode eval --e2e_weights_path <ckpt> --tokenizer
clip_bpe``) end-to-end. The day network exists (zero-egress blocker
documented in ``tools/fetch_checkpoints.py``), paper parity
(``CLIP-ViP/README.md:31-35``) must be one command — this test proves the
command on synthesized assets in the exact released file formats:

- checkpoint: ``clipmodel.``-prefixed VidCLIP torch state_dict in a ``.pt``
  (the layout of ``pretrain_clipvip_base_32.pt``, consumed by the reference
  via ``load_state_dict_with_mismatch``, ref ``load_save.py:86-104``);
- tokenizer: CLIP ``vocab.json`` + ``merges.txt`` (openai/CLIP format).
"""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture()
def bpe_assets(tmp_path):
    """Byte-level vocab + a few merges in the released CLIP file formats."""
    from xpretrain_tpu.data.tokenization import bytes_to_unicode

    byte_vocab = list(bytes_to_unicode().values())
    vocab = byte_vocab + [v + "</w>" for v in byte_vocab]
    merges = [("v", "i"), ("d", "e"), ("vi", "de"), ("o", "</w>"), ("vide", "o</w>")]
    for a, b in merges:
        vocab.append(a + b)
    vocab.extend(["<|startoftext|>", "<|endoftext|>"])
    vocab_path = tmp_path / "vocab.json"
    vocab_path.write_text(json.dumps({tok: i for i, tok in enumerate(vocab)}))
    merges_path = tmp_path / "merges.txt"
    merges_path.write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))
    return str(vocab_path), str(merges_path)


@pytest.fixture()
def released_ckpt(tmp_path):
    """Tiny CLIP-ViP weights torch.saved in the released VidCLIP layout."""
    import torch
    import jax

    from xpretrain_tpu.config import ConfigDict
    from xpretrain_tpu.models.clip_vip import CLIPViPModel
    from xpretrain_tpu.models.clip_vip.convert import flax_to_torch_clip
    from xpretrain_tpu.train.trainer import clip_vip_config_from

    model_cfg = clip_vip_config_from(ConfigDict(clip_size="tiny", crop_img_size=32, bf16=False))
    model = CLIPViPModel(model_cfg)
    video = np.zeros((1, 2, 3, 32, 32), np.float32)
    ids = np.zeros((1, 8), np.int64)
    ids[0, 0], ids[0, 1] = 3, 9
    # NOT the CLI's default --seed (42): the checkpoint must differ from the
    # runner's own init so the features-changed assertion is meaningful
    params = model.init(
        jax.random.PRNGKey(1234), video, ids, (ids >= 0).astype(np.int32)
    )["params"]
    sd = flax_to_torch_clip({"params": params})
    released = {f"clipmodel.{k}": torch.tensor(np.asarray(v)) for k, v in sd.items()}
    path = tmp_path / "pretrain_clipvip_tiny.pt"
    torch.save(released, str(path))
    return str(path)


def _cli_args(tmp_path, out_name, extra):
    return [
        "--mode", "eval",
        "--dummy_data", "1",
        "--clip_size", "tiny",
        "--crop_img_size", "32",
        "--num_frm", "4",
        "--val_batch_size", "8",
        "--max_txt_len", "16",
        "--bf16", "0",
        "--output_dir", str(tmp_path / out_name),
        "--save_feats", str(tmp_path / f"{out_name}_feats.npz"),
    ] + extra


def test_release_checkpoint_eval_cli(tmp_path, bpe_assets, released_ckpt):
    """The one release-day command, end to end on synthesized assets."""
    from xpretrain_tpu.cli import run_retrieval_clipvip

    vocab_path, merges_path = bpe_assets
    report = run_retrieval_clipvip.main(
        _cli_args(tmp_path, "out_release", [
            "--e2e_weights_path", released_ckpt,
            "--tokenizer", "clip_bpe",
            "--tokenizer_vocab", vocab_path,
            "--tokenizer_merges", merges_path,
        ])
    )
    assert "t2v" in report and 0 <= report["t2v"]["R1"] <= 100
    assert "v2t" in report
    assert (tmp_path / "out_release" / "eval_report.json").exists()

    # the converted weights must actually drive the model: features differ
    # from a random-init run over the same synthetic eval set
    report2 = run_retrieval_clipvip.main(
        _cli_args(tmp_path, "out_randinit", [
            "--tokenizer", "clip_bpe",
            "--tokenizer_vocab", vocab_path,
            "--tokenizer_merges", merges_path,
        ])
    )
    a = np.load(tmp_path / "out_release_feats.npz")
    b = np.load(tmp_path / "out_randinit_feats.npz")
    assert a["vis_features"].shape == b["vis_features"].shape
    assert not np.allclose(a["vis_features"], b["vis_features"], atol=1e-4)
    np.testing.assert_allclose(
        np.linalg.norm(a["vis_features"], axis=-1), 1.0, rtol=1e-4
    )


def test_hash_tokenizer_with_weights_warns(tmp_path, released_ckpt, caplog):
    """tokenizer=hash + real weights must emit the loud mismatch warning."""
    import logging

    from xpretrain_tpu.cli import run_retrieval_clipvip

    with caplog.at_level(logging.WARNING):
        run_retrieval_clipvip.main(
            _cli_args(tmp_path, "out_hash", ["--e2e_weights_path", released_ckpt])
        )
    assert any("do NOT match the CLIP BPE" in r.message for r in caplog.records)
