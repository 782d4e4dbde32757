"""Worker for the two-real-process distributed test (run via subprocess).

Each process: ``maybe_init_distributed()`` (before any backend touch) ->
per-process ``BatchLoader`` sharding -> SPMD contrastive train steps with
ZeRO-2 optimizer-state sharding spanning both processes -> sharded retrieval
eval with the on-device gather + valid-len trim. Writes its results to
``<out_dir>/result_<process_id>.json``.

The launching test (``test_multiprocess.py``) runs this twice with
``JAX_NUM_PROCESSES=2`` (4 virtual CPU devices each) and once with a single
process (8 devices) and asserts identical losses/metrics — the behavior the
reference gets from ``horovodrun -np N`` (``CLIP-ViP/README.md:63-66``,
``hd-vila/src/utils/distributed.py:206-245``).
"""

import json
import os
import sys


def main() -> None:
    out_dir = sys.argv[1]

    # The session's axon TPU plugin overrides JAX_PLATFORMS at import, so the
    # cpu platform must be forced through jax.config before any backend touch
    # (same recipe as tests/conftest.py / __graft_entry__._force_virtual_cpu).
    import jax

    jax.config.update("jax_platforms", "cpu")
    if int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1:
        # cross-process CPU collectives need the gloo transport
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    # must happen before jax touches the backend (parallel/mesh.py:24-52)
    from xpretrain_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    import jax.numpy as jnp
    import numpy as np

    expected = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    assert jax.process_count() == expected, (jax.process_count(), expected)
    pi, pc = jax.process_index(), jax.process_count()

    from xpretrain_tpu.data.datasets import RetrievalCollator, SyntheticVideoTextDataset
    from xpretrain_tpu.data.loader import BatchLoader, SequentialEvalLoader
    from xpretrain_tpu.data.tokenization import HashTokenizer
    from xpretrain_tpu.data.transforms import clip_transform
    from xpretrain_tpu.models.clip_vip import (
        CLIPTextConfig,
        CLIPVipConfig,
        CLIPVisionConfig,
        CLIPViPModel,
        VipConfig,
    )
    from xpretrain_tpu.ops.losses import build_loss_fn
    from xpretrain_tpu.optim import build_optimizer, get_schedule
    from xpretrain_tpu.parallel.mesh import create_mesh, shard_host_batch
    from xpretrain_tpu.parallel.train_step import (
        TrainState,
        make_eval_step,
        make_train_step,
        zero2_state_shardings,
    )
    from xpretrain_tpu.train.evaluate import evaluate_retrieval

    IMG, SEQ = 32, 16
    cfg = CLIPVipConfig(
        text=CLIPTextConfig(
            vocab_size=49408, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
        ),
        vision=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=IMG, patch_size=16,
        ),
        vip=VipConfig(temporal_size=2, add_cls_num=2),
        projection_dim=16,
        dtype=jnp.float32,
    )
    model = CLIPViPModel(cfg)

    class Transformed:
        def __init__(self, size, seed):
            self.ds = SyntheticVideoTextDataset(
                size=size, num_frames=2, image_size=IMG, seed=seed
            )

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            item = self.ds[i]
            item["video"] = clip_transform(item["frames"], IMG)
            return item

    collate = RetrievalCollator(HashTokenizer(), max_txt_len=SEQ)
    global_batch = 16
    train_loader = BatchLoader(
        Transformed(48, seed=0), global_batch // pc, collate,
        seed=0, process_index=pi, process_count=pc,
    )
    val_loader = SequentialEvalLoader(  # global eval batch 8 either way
        Transformed(22, seed=7), 8 // pc, collate, process_index=pi, process_count=pc
    )

    mesh = create_mesh()  # 1-D data mesh over all 8 global devices
    assert mesh.devices.size == 8, mesh.devices.size

    sample = next(iter(train_loader))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["video"][:1]),
        jnp.asarray(sample["text_input_ids"][:1]),
        jnp.asarray(sample["text_input_mask"][:1]),
    )["params"]
    tx, _ = build_optimizer(
        params, get_schedule("constant", 1e-3, 10, warmup_ratio=0.0), weight_decay=0.0
    )
    # ZeRO-2 state sharded over the data axis -> spans both processes
    opt_shardings = zero2_state_shardings(tx, params, mesh, min_size=64)
    loss_fn = build_loss_fn("NCELearnableTempLoss")

    def apply_fn(p, b, r):
        return model.apply(
            {"params": p}, b["video"], b["text_input_ids"], b["text_input_mask"]
        )

    losses = []
    with mesh:
        step = make_train_step(
            apply_fn, tx, mesh, loss_fn, opt_state_shardings=opt_shardings, donate=False
        )
        state = TrainState.create(params, tx)
        for i, batch in enumerate(train_loader):
            if i >= 3:
                break
            db = shard_host_batch(batch, mesh)
            state, metrics = step(state, db, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))

        eval_step = make_eval_step(apply_fn, mesh)
        loader = (shard_host_batch(b, mesh) for b in val_loader)
        report = evaluate_retrieval(
            eval_step, state.params, loader, valid_len=val_loader.valid_len
        )

    result = {
        "process_count": pc,
        "losses": losses,
        "t2v": report["t2v"],
        "v2t": report["v2t"],
        "t2v_dsl": report["t2v_dsl"],
        "logit_scale": float(np.asarray(state.params["logit_scale"]).reshape(-1)[0]),
    }
    with open(os.path.join(out_dir, f"result_{pi}.json"), "w") as f:
        json.dump(result, f)
    print(f"worker {pi}/{pc} done: losses={losses}")


if __name__ == "__main__":
    main()
