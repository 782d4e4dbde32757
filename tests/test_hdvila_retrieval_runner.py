"""HD-VILA retrieval runner smoke (tiny synthetic)."""

import pytest
import json


pytestmark = pytest.mark.slow

def test_hdvila_retrieval_runner(tmp_path):
    from xpretrain_tpu.cli import run_retrieval_hdvila

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
    report = run_retrieval_hdvila.main(
        [
            "--config", str(cfg_json),
            "--dummy_data", "1",
            "--num_train_steps", "1",
            "--train_batch_size", "8",
            "--val_batch_size", "8",
            "--num_frm", "3",
            "--train_n_clips", "1",
            "--output_dir", str(tmp_path / "out"),
            "--log_steps", "1",
            "--bf16", "0",
            "--max_txt_len", "8",
            "--learning_rate", "1e-4",
        ]
    )
    assert "t2v" in report and 0 <= report["t2v"]["R1"] <= 100
