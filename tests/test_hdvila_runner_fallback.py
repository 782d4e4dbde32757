"""Stage-2 b>=16 auto grad-accum fallback (r4 verdict missing #3 / ask #8).

The rewrite itself is a pure function of (cfg, backend); these tests pin
every gate: stage, backend, opt-out flag, explicit-accum respect, batch
divisibility."""

from xpretrain_tpu.cli.run_pretrain_hdvila import apply_stage2_batch_fallback


def _cfg(**kw):
    base = {"stage": 2, "train_batch_size": 16, "gradient_accumulation_steps": 1,
            "stage2_b16_fallback": 1}
    base.update(kw)
    return base


def test_b16_splits_into_2x8_on_tpu():
    cfg = apply_stage2_batch_fallback(_cfg(), backend="tpu")
    assert cfg["train_batch_size"] == 8
    assert cfg["gradient_accumulation_steps"] == 2


def test_b32_splits_into_4x8():
    cfg = apply_stage2_batch_fallback(_cfg(train_batch_size=32), backend="tpu")
    assert (cfg["train_batch_size"], cfg["gradient_accumulation_steps"]) == (8, 4)


def test_no_rewrite_off_tpu_or_stage1_or_small_batch():
    assert apply_stage2_batch_fallback(_cfg(), backend="cpu")["train_batch_size"] == 16
    assert apply_stage2_batch_fallback(_cfg(stage=1), backend="tpu")["train_batch_size"] == 16
    assert apply_stage2_batch_fallback(_cfg(train_batch_size=8), backend="tpu")[
        "train_batch_size"] == 8


def test_explicit_accum_and_optout_respected():
    cfg = apply_stage2_batch_fallback(
        _cfg(gradient_accumulation_steps=4), backend="tpu")
    assert (cfg["train_batch_size"], cfg["gradient_accumulation_steps"]) == (16, 4)
    cfg = apply_stage2_batch_fallback(_cfg(stage2_b16_fallback=0), backend="tpu")
    assert cfg["train_batch_size"] == 16


def test_indivisible_batch_left_alone():
    cfg = apply_stage2_batch_fallback(_cfg(train_batch_size=20), backend="tpu")
    assert cfg["train_batch_size"] == 20
