"""Training driver for the CLIP-ViP family: pretrain + retrieval fine-tune.

The TPU-native counterpart of the reference's flat ``start_training`` loops
(``CLIP-ViP/src/pretrain/run_pretrain.py:202-445``,
``src/tasks/run_video_retrieval.py:205-434``): model/optimizer setup, resume,
the jitted SPMD step, LR scheduling (inside the step), gradient accumulation
(optax.MultiSteps), periodic validation with best-model tracking, periodic
checkpoints, scalar logging. Step-zero validation is kept as the end-to-end
smoke test (ref ``run_pretrain.py:321-322``).
"""

from __future__ import annotations


from typing import Any, Callable, Optional

import jax
import numpy as np

from xpretrain_tpu.models.clip_vip import (
    CLIPTextConfig,
    CLIPVipConfig,
    CLIPVisionConfig,
    CLIPViPModel,
    VipConfig,
)
from xpretrain_tpu.ops.losses import build_loss_fn
from xpretrain_tpu.optim import build_optimizer, get_schedule
from xpretrain_tpu.optim.optimizer import (
    cast_params_for_storage,
    master_weights,
    moment_dtype_from_cfg as _moment_dtype,
    param_dtype_from_cfg as _param_dtype,
)
from xpretrain_tpu.parallel.fsdp import resolve_shardings
from xpretrain_tpu.parallel.mesh import mesh_from_config, shard_host_batch
from xpretrain_tpu.parallel.train_step import (
    TrainState,
    make_eval_step,
    make_train_step,
)
from xpretrain_tpu.train.checkpoints import BestModelSaver, CheckpointManager
from xpretrain_tpu.train.evaluate import evaluate_retrieval
from xpretrain_tpu.train.loop import drive_train_loop
from xpretrain_tpu.utils.logging import LOGGER, RunningMeter, ScalarWriter


def clip_vip_config_from(cfg) -> CLIPVipConfig:
    """Build a model config from a ConfigDict-style training config."""
    import jax.numpy as jnp

    vip = cfg.get("clip_vision_additional_config", {})
    size = cfg.get("clip_size", "base_32")
    factory = {
        "base_32": CLIPVipConfig.base_patch32,
        "base_16": CLIPVipConfig.base_patch16,
        "large_14": CLIPVipConfig.large_patch14,
        "tiny": lambda **kw: CLIPVipConfig.tiny_debug(
            image_size=int(cfg.get("crop_img_size", 32)), **kw
        ),
    }[size]
    model_cfg = factory(
        vip=VipConfig(
            type=vip.get("type", "ViP"),
            temporal_size=int(vip.get("temporal_size", 12)),
            if_use_temporal_embed=bool(vip.get("if_use_temporal_embed", 1)),
            add_cls_num=int(vip.get("add_cls_num", 3)),
            logit_scale_init_value=float(vip.get("logit_scale_init_value", 4.60)),
        ),
        dtype=jnp.bfloat16 if cfg.get("bf16", True) else jnp.float32,
        remat=bool(cfg.get("gradient_checkpointing", False)),
    )
    return model_cfg


class ClipVipTrainer:
    """End-to-end CLIP-ViP training over a data mesh."""

    def __init__(
        self,
        cfg,
        train_loader,
        val_loader=None,
        val_valid_len: Optional[int] = None,
        model_cfg: Optional[CLIPVipConfig] = None,
        init_params: Optional[Any] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh_from_config(cfg)
        self.model = CLIPViPModel(model_cfg or clip_vip_config_from(cfg))
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.val_valid_len = val_valid_len

        # ---- params ----
        if init_params is None:
            sample = next(iter(train_loader))
            if isinstance(sample, tuple):  # MetaLoader yields (task, batch)
                _task, sample = sample
            rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
            init_params = self.model.init(
                rng,
                jax.numpy.asarray(sample["video"][:1]),
                jax.numpy.asarray(sample["text_input_ids"][:1]),
                jax.numpy.asarray(sample["text_input_mask"][:1]),
            )["params"]
        # host copy: the train step donates its input state buffers, so the
        # originals must not be device arrays we hand out elsewhere
        self.init_params = jax.tree_util.tree_map(np.asarray, init_params)
        init_params = self.init_params

        # ---- io (created before the optimizer so resume can adapt the
        # optimizer-state layout to what the checkpoint was written with) ----
        out_dir = cfg.get("output_dir", "/tmp/xpt_output")
        self.ckpt = CheckpointManager(
            f"{out_dir}/ckpt", max_to_keep=2,
            async_save=bool(cfg.get("async_checkpoint", False)),
        )
        self.best = BestModelSaver(out_dir)
        self.writer = ScalarWriter(f"{out_dir}/log", jax.process_index())
        self.meter = RunningMeter("train_loss")

        # ---- optimizer ----
        fused = bool(cfg.get("fused_adamw", True))
        saved_fused = self.ckpt.saved_uses_fused_layout()
        if saved_fused is not None and saved_fused != fused:
            # Checkpoints written before --fused_adamw defaulted to 1 carry
            # the optax multi_transform state tree; restoring it into the
            # flat fused layout fails deep inside orbax. Follow the saved
            # layout instead of requiring the operator to know the flag.
            LOGGER.warning(
                "checkpoint in %s/ckpt uses fused_adamw=%d optimizer-state layout; "
                "overriding configured fused_adamw=%d to resume it",
                out_dir, int(saved_fused), int(fused),
            )
            fused = saved_fused
        num_steps = int(cfg.get("num_train_steps", 1000))
        schedule = get_schedule(
            cfg.get("decay", "cosine"),
            float(cfg.get("learning_rate", 5e-6)),
            num_steps,
            warmup_ratio=float(cfg.get("warmup_ratio", 0.1)),
        )
        frozen = list(cfg.get("frozen_patterns", ()))
        if cfg.get("freeze_text_model"):
            # VidCLIP.freeze_text_encoder (ref VidCLIP.py:96-103)
            frozen.append("text_model")
            if cfg.get("freeze_text_proj"):
                frozen.append("text_projection")
        self.tx, _ = build_optimizer(
            init_params,
            schedule,
            weight_decay=float(cfg.get("weight_decay", 0.2)),
            betas=tuple(cfg.get("betas", (0.9, 0.98))),
            lr_mul=float(cfg.get("lr_mul", 1.0)),
            lr_mul_prefix=cfg.get("lr_mul_prefix", ""),
            max_grad_norm=float(cfg.get("grad_norm", 2.0)),
            grad_accum_steps=int(cfg.get("gradient_accumulation_steps", 1)),
            frozen_patterns=tuple(frozen),
            fused=fused,
            moment_dtype=_moment_dtype(cfg),
        )
        pd = _param_dtype(cfg)
        if pd is not None:
            # --param_dtype bf16: store fwd/bwd params reduced-precision with
            # fp32 masters inside the optimizer state (optim.master_weights)
            self.init_params = cast_params_for_storage(self.init_params, pd)
            init_params = self.init_params
            self.tx = master_weights(self.tx)
        self.num_train_steps = num_steps * int(cfg.get("gradient_accumulation_steps", 1))

        loss_fn = build_loss_fn(cfg.get("loss_name", "NCELearnableTempLoss"))
        self.param_shardings, opt_shardings = resolve_shardings(
            cfg, self.tx, init_params, self.mesh
        )
        self.steps_per_call = max(1, int(cfg.get("steps_per_call", 1)))
        self.train_step = make_train_step(
            self._apply_train, self.tx, self.mesh, loss_fn,
            opt_state_shardings=opt_shardings,
            param_shardings=self.param_shardings,
            steps_per_call=self.steps_per_call,
        )
        self.eval_step = make_eval_step(
            self._apply_eval, self.mesh, param_shardings=self.param_shardings
        )

    # ---- model plumbing -------------------------------------------------

    def _apply_train(self, params, batch, rng):
        kwargs = {}
        if "image" in batch:
            kwargs = {
                "image": batch["image"],
                "caption_ids": batch["caption_ids"],
                "caption_masks": batch["caption_masks"],
            }
        return self.model.apply(
            {"params": params},
            batch["video"],
            batch["text_input_ids"],
            batch["text_input_mask"],
            deterministic=False,
            rngs={"dropout": rng},
            **kwargs,
        )

    def _apply_eval(self, params, batch, rng):
        return self.model.apply(
            {"params": params},
            batch["video"],
            batch["text_input_ids"],
            batch["text_input_mask"],
        )

    # ---- loops ----------------------------------------------------------

    def validate(self, params, save_feats_path: Optional[str] = None) -> dict:
        if self.val_loader is None:
            return {}
        loader = (
            shard_host_batch(b, self.mesh) for b in self.val_loader
        )
        return evaluate_retrieval(
            self.eval_step, params, loader, self.val_valid_len,
            save_feats_path=save_feats_path,
        )

    def train(self) -> TrainState:
        state = TrainState.create(self.init_params, self.tx)
        restored = self.ckpt.restore(jax.tree_util.tree_map(np.asarray, state))
        if restored is not None:
            state = restored
        start_step = int(state.step)
        rng = jax.random.PRNGKey(int(self.cfg.get("seed", 0)) + 1)

        if self.cfg.get("validate_at_start", True) and self.val_loader is not None:
            report = self.validate(state.params)
            if report:
                self.writer.log_scalar_dict(report.get("t2v", {}), prefix="val_t2v", step=start_step)

        def on_log(step, metrics, sps):
            loss = float(metrics["loss"])
            self.meter(loss)
            LOGGER.info(
                "step %d/%d loss %.4f | %.2f steps/s", step, self.num_train_steps, loss, sps
            )
            self.writer.log_scalar_dict(
                {"loss": loss, "steps_per_s": sps, "grad_norm": float(metrics["grad_norm"])},
                prefix="train",
                step=step,
            )

        def on_validate(step, state):
            if self.val_loader is None:
                return
            report = self.validate(state.params)
            score = report.get("t2v", {}).get("R1", 0.0)
            self.best.maybe_save(step, score, jax.tree_util.tree_map(np.asarray, state.params))
            self.writer.log_scalar_dict(report.get("t2v", {}), prefix="val_t2v", step=step)

        def on_save(step, state):
            self.ckpt.save(step, jax.tree_util.tree_map(np.asarray, state))

        state = drive_train_loop(
            train_step=self.train_step,
            loader=self.train_loader,
            state=state,
            rng=rng,
            mesh=self.mesh,
            num_train_steps=self.num_train_steps,
            steps_per_call=self.steps_per_call,
            log_every=int(self.cfg.get("log_steps", 20)),
            valid_every=int(self.cfg.get("valid_steps", 500)),
            save_every=int(self.cfg.get("save_steps", 500)),
            on_log=on_log,
            on_validate=on_validate,
            on_save=on_save,
            on_step=(lambda s: self.ckpt.poll()) if self.ckpt.async_save else None,
            profile_dir=f"{self.cfg.get('output_dir', '/tmp/xpt_output')}/profile",
            profile_start_step=int(self.cfg.get("profile_start_step", 3)),
            profile_num_steps=int(self.cfg.get("profile_steps", 0)),
        )
        self.writer.flush()
        self.ckpt.wait()  # drain any in-flight async checkpoint
        return state
