"""ZeRO-3 / FSDP param sharding: the FSDP step must match the pure-DP step.

TPU-native extension one level past the reference's DeepSpeed ZeRO-2
(``LF-VILA/src/configs/pretrain_stage1.yaml:98-128`` shards only optimizer
state): ``parallel/fsdp.py`` shards the params themselves (and their Adam
moments) over the ``data`` axis, optionally composed with tensor
parallelism. Runs on the virtual 8-device CPU mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from xpretrain_tpu.models.clip_vip import (
    CLIPTextConfig,
    CLIPVipConfig,
    CLIPVisionConfig,
    CLIPViPModel,
    VipConfig,
)
from xpretrain_tpu.ops.losses import build_loss_fn
from xpretrain_tpu.optim import build_optimizer, get_schedule
from xpretrain_tpu.parallel.fsdp import (
    fsdp_param_shardings,
    fsdp_pspec,
    fsdp_state_shardings,
    resolve_shardings,
)
from xpretrain_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, create_mesh, shard_host_batch
from xpretrain_tpu.parallel.train_step import TrainState, make_train_step


def _tiny_model():
    cfg = CLIPVipConfig(
        text=CLIPTextConfig(
            vocab_size=500, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
        ),
        vision=CLIPVisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=16,
        ),
        vip=VipConfig(temporal_size=2, add_cls_num=1),
        projection_dim=32,
    )
    return CLIPViPModel(cfg)


def _batch(n=8):
    rng = np.random.default_rng(0)
    video = rng.normal(size=(n, 2, 3, 32, 32)).astype(np.float32)
    ids = np.zeros((n, 16), np.int32)
    ids[:, 0] = 499
    ids[:, 1:5] = rng.integers(5, 400, size=(n, 4))
    ids[:, 5] = 498
    return {
        "video": video,
        "text_input_ids": ids,
        "text_input_mask": (ids > 0).astype(np.int32),
    }


def test_fsdp_pspec_rules():
    # large 2-D leaf: largest divisible dim shards over data
    assert fsdp_pspec("/x/fc1/kernel", (64, 512), dp=4, min_size=64) == P(None, DATA_AXIS)
    assert fsdp_pspec("/x/embed/embedding", (512, 64), dp=4, min_size=64) == P(DATA_AXIS)
    # small leaves (norms/biases/scalars) stay replicated
    assert fsdp_pspec("/x/layer_norm/scale", (64,), dp=4, min_size=16384) == P()
    assert fsdp_pspec("/logit_scale", (), dp=4, min_size=16384) == P()
    # indivisible dims fall back to replicated
    assert fsdp_pspec("/x/k", (7, 13), dp=4, min_size=1) == P()
    # TP composition: model-axis dim preserved, data shards a different dim
    assert fsdp_pspec("/a/mlp/fc1/kernel", (64, 128), dp=2, tp=4, min_size=64) == P(
        DATA_AXIS, MODEL_AXIS
    )
    assert fsdp_pspec("/a/mlp/fc2/kernel", (128, 64), dp=2, tp=4, min_size=64) == P(
        MODEL_AXIS, DATA_AXIS
    )
    # a column-sharded bias is 1-D and fully claimed by TP: no data dim left
    assert fsdp_pspec("/a/self_attn/q_proj/bias", (64,), dp=2, tp=4, min_size=1) == P(
        MODEL_AXIS
    )


@pytest.mark.parametrize("mesh_shape,tp", [((8,), 1), ((4, 2), 2)])
@pytest.mark.slow
def test_fsdp_train_step_matches_dp(mesh_shape, tp):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = _tiny_model()
    batch = _batch(8)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["video"][:1]),
        jnp.asarray(batch["text_input_ids"][:1]),
        jnp.asarray(batch["text_input_mask"][:1]),
    )["params"]
    loss_fn = build_loss_fn("NCELearnableTempLoss")

    def apply_fn(p, b, r):
        return model.apply(
            {"params": p}, b["video"], b["text_input_ids"], b["text_input_mask"]
        )

    def run(mesh, fsdp):
        schedule = get_schedule("cosine", 1e-3, 100)
        tx, _ = build_optimizer(params, schedule, weight_decay=0.1)
        if fsdp:
            pshard = fsdp_param_shardings(params, mesh, tp=tp, min_size=64)
            oshard = fsdp_state_shardings(tx, params, mesh, tp=tp, min_size=64)
        else:
            pshard = oshard = None
        with mesh:
            step = make_train_step(
                apply_fn, tx, mesh, loss_fn,
                param_shardings=pshard, opt_state_shardings=oshard, donate=False,
            )
            state = TrainState.create(params, tx)
            if fsdp:
                state = state.replace(
                    params=jax.device_put(state.params, pshard),
                    opt_state=jax.device_put(state.opt_state, oshard),
                )
            db = shard_host_batch(batch, mesh)
            return step(state, db, jax.random.PRNGKey(1))

    dp_mesh = create_mesh(devices=jax.devices()[:8])
    axes = ("data",) if len(mesh_shape) == 1 else ("data", "model")
    fsdp_mesh = create_mesh(mesh_shape, axes, devices=jax.devices()[:8])
    dp_state, dp_metrics = run(dp_mesh, fsdp=False)
    fs_state, fs_metrics = run(fsdp_mesh, fsdp=True)

    np.testing.assert_allclose(
        float(fs_metrics["loss"]), float(dp_metrics["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(dp_state.params),
        jax.tree_util.tree_leaves(fs_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)

    # the layout must actually reduce per-device param memory: every large
    # leaf is split over data, so each device holds ~1/dp of those elements
    dp_size = fsdp_mesh.shape[DATA_AXIS]
    flat, _ = jax.tree_util.tree_flatten_with_path(fs_state.params)
    for kp, leaf in flat:
        if leaf.size >= 64:
            shard = leaf.addressable_shards[0].data
            name = "/".join(str(getattr(k, "key", k)) for k in kp)
            # every large leaf sharded somehow (1-D TP'd biases split over
            # model only); every kernel/embedding split over data too
            assert shard.size < leaf.size, (name, leaf.shape, shard.shape)
            if leaf.ndim >= 2:
                assert shard.size <= leaf.size // dp_size, (
                    name, leaf.shape, shard.shape
                )


def test_resolve_shardings_policy():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = _tiny_model()
    batch = _batch(1)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["video"]),
        jnp.asarray(batch["text_input_ids"]),
        jnp.asarray(batch["text_input_mask"]),
    )["params"]
    mesh = create_mesh(devices=jax.devices()[:8])
    tx, _ = build_optimizer(params, get_schedule("cosine", 1e-3, 100), weight_decay=0.1)

    # default: replicated params, ZeRO-2 moments
    pshard, oshard = resolve_shardings({}, tx, params, mesh)
    assert pshard is None and oshard is not None

    # zero2 off: everything replicated
    pshard, oshard = resolve_shardings({"zero2": False}, tx, params, mesh)
    assert pshard is None and oshard is None

    # zero3: params sharded over data
    pshard, oshard = resolve_shardings({"zero3": 1}, tx, params, mesh)
    assert pshard is not None and oshard is not None
    flat, _ = jax.tree_util.tree_flatten_with_path(pshard)
    specs = {"/".join(str(getattr(k, "key", k)) for k in kp): s.spec for kp, s in flat}
    emb = [s for p, s in specs.items() if "token_embedding" in p]
    assert emb and all(DATA_AXIS in [a for a in s if a] for s in emb)
