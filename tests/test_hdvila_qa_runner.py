"""HD-VILA QA runner: tiny train -> inference restore roundtrip; e2e converter."""

import pytest
import json

import numpy as np


pytestmark = pytest.mark.slow

def _tiny_cfg(tmp_path):
    cfg_json = tmp_path / "tiny.json"
    cfg_json.write_text(
        json.dumps(
            {
                "resnet_depth": 18,
                "hidden_size": 64,
                "timesformer_depth": 1,
                "timesformer_heads": 4,
                "bert": "tiny",
                "crop_size": [128, 192],
                "pixel_random_sampling_size": 0,
            }
        )
    )
    return str(cfg_json)


def test_qa_runner_train_and_inference(tmp_path):
    from xpretrain_tpu.cli import run_video_qa_hdvila

    out_dir = str(tmp_path / "out")
    common = [
        "--config", _tiny_cfg(tmp_path),
        "--dummy_data", "1",
        "--task_type", "mc",
        "--num_options", "3",
        "--train_batch_size", "8",
        "--val_batch_size", "8",
        "--num_frm", "3",
        "--train_n_clips", "1",
        "--output_dir", out_dir,
        "--bf16", "0",
        "--max_txt_len", "8",
    ]
    report = run_video_qa_hdvila.main(
        common + ["--num_train_steps", "2", "--valid_steps", "2", "--log_steps", "1",
                  "--learning_rate", "1e-4",
                  "--inference_n_clips", "2", "--score_agg_func", "mean"]
    )
    assert 0.0 <= report["accuracy"] <= 1.0
    # multi-clip inference reports per-question predictions
    assert len(report["qa_results"]) == report["n"]
    assert report["qa_results"][0]["question_id"] == 1000
    # standalone inference restores args.json + the best checkpoint
    report2 = run_video_qa_hdvila.main(
        ["--mode", "inference", "--output_dir", out_dir, "--config", _tiny_cfg(tmp_path)]
    )
    assert 0.0 <= report2["accuracy"] <= 1.0
    assert (tmp_path / "out" / "inference_report.json").exists()


def test_hdvila_e2e_converter_routes_prefixes():
    import torch

    from xpretrain_tpu.models.hd_vila.convert import hdvila_e2e_torch_to_flax

    sd = {
        "cnn.conv1.weight": torch.zeros(8, 3, 7, 7),
        "cnn.bn1.weight": torch.ones(8),
        "cnn.bn1.bias": torch.zeros(8),
        "cnn.bn1.running_mean": torch.zeros(8),
        "cnn.bn1.running_var": torch.ones(8),
        "grid_encoder.0.weight": torch.zeros(16, 8, 1, 1),
        "timesformer.pos_embed": torch.zeros(1, 6, 16),
        "timesformer.time_embed": torch.zeros(1, 3, 16),
        "transformer.bert.embeddings.word_embeddings.weight": torch.zeros(100, 16),
        "transformer.bert.pooler1.dense.weight": torch.zeros(16, 16),
        "transformer.bert.pooler1.dense.bias": torch.zeros(16),
        "transformer.bert.visual_embeddings.row_position_embeddings.weight": torch.zeros(10, 16),
        "transformer.bert.visual_embeddings.token_type_embeddings.weight": torch.zeros(1, 16),
        "transformer.bert.visual_embeddings.LayerNorm.weight": torch.ones(16),
        "transformer.bert.visual_embeddings.LayerNorm.bias": torch.zeros(16),
        "transformer.t_proj.weight": torch.zeros(16, 16),
        "transformer.t_proj.bias": torch.zeros(16),
        "transformer.cls.seq_relationship.weight": torch.zeros(2, 16),
        "transformer.cls.seq_relationship.bias": torch.zeros(2),
    }
    out = hdvila_e2e_torch_to_flax(sd)
    assert out["encoder"]["cnn"]["conv1"]["kernel"].shape == (7, 7, 3, 8)
    assert out["encoder"]["grid_encoder_conv"]["kernel"].shape == (1, 1, 8, 16)
    assert out["encoder"]["timesformer"]["pos_embed"].shape == (1, 6, 16)
    tb = out["transformer"]["bert_model"]
    assert tb["bert"]["embeddings"]["word_embeddings"]["embedding"].shape == (100, 16)
    assert tb["pooler1"]["dense"]["kernel"].shape == (16, 16)
    assert tb["visual_embeddings"]["token_type_embedding"].shape == (1, 1, 16)
    assert out["transformer"]["t_proj"]["kernel"].shape == (16, 16)
    assert out["transformer"]["seq_relationship"]["kernel"].shape == (16, 2)
