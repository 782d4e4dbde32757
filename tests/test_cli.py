"""CLI runners smoke-tested end-to-end with synthetic data on the CPU mesh."""

import numpy as np
import pytest


@pytest.mark.slow
def test_retrieval_cli_eval_mode(tmp_path):
    from xpretrain_tpu.cli import run_retrieval_clipvip

    report = run_retrieval_clipvip.main(
        [
            "--mode", "eval",
            "--dummy_data", "1",
            "--num_frm", "2",
            "--crop_img_size", "32",
            "--max_txt_len", "12",
            "--val_batch_size", "8",
            "--train_batch_size", "8",
            "--num_train_steps", "1",
            "--output_dir", str(tmp_path),
            "--clip_size", "tiny",
            "--validate_at_start", "0",
        ]
    )
    assert "t2v" in report
    assert 0 <= report["t2v"]["R1"] <= 100
    assert (tmp_path / "eval_report.json").exists()
    assert (tmp_path / "log" / "args.json").exists()


def test_retrieval_cli_device_ingest_matches_host_normalize(tmp_path):
    """uint8 device-ingest eval must reproduce host-normalized fp32 metrics."""
    from xpretrain_tpu.cli import run_retrieval_clipvip

    common = [
        "--mode", "eval",
        "--dummy_data", "1",
        "--num_frm", "2",
        "--crop_img_size", "32",
        "--max_txt_len", "12",
        "--val_batch_size", "8",
        "--train_batch_size", "8",
        "--num_train_steps", "1",
        "--clip_size", "tiny",
        "--validate_at_start", "0",
        "--seed", "3",
    ]
    r_host = run_retrieval_clipvip.main(
        common + ["--output_dir", str(tmp_path / "host"), "--device_ingest", "0"]
    )
    r_dev = run_retrieval_clipvip.main(
        common + ["--output_dir", str(tmp_path / "dev"), "--device_ingest", "1"]
    )
    # same seed -> same init params. Folded-normalization rounding can flip
    # near-tie ranks of a random-init model; exact u8==f32 numerics are
    # covered by test_patchify. Allow a couple of rank flips out of 128.
    for key in ("R1", "R5", "R10"):
        assert abs(r_host["t2v"][key] - r_dev["t2v"][key]) <= 2.0, key


@__import__('pytest').mark.slow
def test_pretrain_cli_with_image_branch(tmp_path):
    """CLIP-ViP pretrain runner: MetaLoader + vsc_fc loss over the synthetic
    video/subtitle + image/caption branch."""
    from xpretrain_tpu.cli import run_pretrain_clipvip

    run_pretrain_clipvip.main(
        [
            "--dummy_data", "1",
            "--num_frm", "2",
            "--crop_img_size", "32",
            "--max_txt_len", "12",
            "--train_batch_size", "8",
            "--num_train_steps", "2",
            "--clip_size", "tiny",
            "--loss_name", "NCELearnableTempLoss_vsc_fc",
            "--output_dir", str(tmp_path),
            "--log_steps", "1",
            "--valid_steps", "100",
            "--save_steps", "100",
            "--learning_rate", "1e-4",
            "--bf16", "0",
        ]
    )
    assert (tmp_path / "log" / "args.json").exists()


def test_config_preset_merge(tmp_path):
    from xpretrain_tpu.cli.shared_args import build_shared_parser, parse_args

    parser = build_shared_parser()
    cfg = parse_args(
        parser,
        [
            "--config", "xpretrain_tpu/configs/presets/msrvtt_retrieval_vip_base_32.json",
            "--learning_rate", "5e-5",  # explicit CLI wins
        ],
    )
    assert cfg.loss_name == "NCELearnableTempLoss"  # from file
    assert cfg.learning_rate == 5e-5  # CLI override
    assert cfg.num_frm == 12
    assert cfg.clip_vision_additional_config.add_cls_num == 3


@pytest.mark.slow
def test_pretrain_cli_tensor_parallel(tmp_path):
    """--tp 2 trains on a (data=4, model=2) mesh with Megatron param sharding."""
    from xpretrain_tpu.cli import run_pretrain_clipvip

    run_pretrain_clipvip.main(
        [
            "--dummy_data", "1",
            "--num_frm", "2",
            "--crop_img_size", "32",
            "--max_txt_len", "12",
            "--train_batch_size", "8",
            "--num_train_steps", "2",
            "--clip_size", "tiny",
            "--output_dir", str(tmp_path),
            "--log_steps", "1",
            "--valid_steps", "100",
            "--save_steps", "100",
            "--learning_rate", "1e-4",
            "--bf16", "0",
            "--tp", "2",
        ]
    )
    assert (tmp_path / "log" / "args.json").exists()


def test_retrieval_cli_save_feats(tmp_path):
    """--save_feats dumps the gathered eval features + ids (the reference's
    save_feat option, run_video_retrieval.py:233)."""
    from xpretrain_tpu.cli import run_retrieval_clipvip

    feats = tmp_path / "feats.npz"
    run_retrieval_clipvip.main(
        [
            "--mode", "eval",
            "--dummy_data", "1",
            "--num_frm", "2",
            "--crop_img_size", "32",
            "--max_txt_len", "12",
            "--val_batch_size", "8",
            "--train_batch_size", "8",
            "--num_train_steps", "1",
            "--output_dir", str(tmp_path),
            "--clip_size", "tiny",
            "--validate_at_start", "0",
            "--save_feats", str(feats),
        ]
    )
    data = np.load(feats)
    assert data["vis_features"].shape == data["text_features"].shape
    assert data["vis_features"].shape[0] == 128  # dummy val ds size
    assert data["ids"].shape == (128,)
    # features are L2-normalized by the model forward
    norms = np.linalg.norm(data["vis_features"], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-2)
