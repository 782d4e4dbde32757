"""Generic SPMD trainer for models that compute their own losses.

The LF-VILA/HD-VILA counterpart of the reference's per-workload Trainer
classes (``LF-VILA/src/tools/trainer_pretrain.py:23-313`` and siblings):
step loop with the jitted SPMD step, LR schedule inside the step, periodic
checkpoint/resume, scalar logging, optional eval callback with best-model
tracking. LF-VILA's DeepSpeed engine (backward/step/ZeRO-2) collapses into
the optax update with sharded optimizer state.
"""

from __future__ import annotations


from typing import Any, Callable, Optional

import jax
import numpy as np

from xpretrain_tpu.optim import build_optimizer, get_schedule
from xpretrain_tpu.optim.optimizer import (
    cast_params_for_storage,
    master_weights,
    moment_dtype_from_cfg as _moment_dtype,
    param_dtype_from_cfg as _param_dtype,
)
from xpretrain_tpu.parallel.fsdp import resolve_shardings
from xpretrain_tpu.parallel.mesh import mesh_from_config
from xpretrain_tpu.parallel.train_step import (
    TrainState,
    make_model_train_step,
)
from xpretrain_tpu.train.checkpoints import BestModelSaver, CheckpointManager
from xpretrain_tpu.train.loop import drive_train_loop
from xpretrain_tpu.utils.logging import LOGGER, RunningMeter, ScalarWriter


class GenericTrainer:
    """Drive any ``apply_fn(params, batch, rng) -> {..., 'loss'}`` model."""

    def __init__(
        self,
        cfg,
        apply_fn: Callable,
        init_params: Any,
        train_loader,
        eval_fn: Optional[Callable[[Any], dict]] = None,
        metric_keys: tuple[str, ...] = (),
        no_decay_patterns=None,
    ):
        self.cfg = cfg
        self.mesh = mesh_from_config(cfg)
        self.apply_fn = apply_fn
        self.train_loader = train_loader
        self.eval_fn = eval_fn
        self.init_params = jax.tree_util.tree_map(np.asarray, init_params)

        # io first, so resume can adapt the optimizer-state layout to what
        # the checkpoint was written with (see ClipVipTrainer)
        out_dir = cfg.get("output_dir", "/tmp/xpt_output")
        self.ckpt = CheckpointManager(
            f"{out_dir}/ckpt", max_to_keep=2,
            async_save=bool(cfg.get("async_checkpoint", False)),
        )
        self.best = BestModelSaver(out_dir)
        self.writer = ScalarWriter(f"{out_dir}/log", jax.process_index())
        self.meter = RunningMeter("train_loss")

        fused = bool(cfg.get("fused_adamw", True))
        saved_fused = self.ckpt.saved_uses_fused_layout()
        if saved_fused is not None and saved_fused != fused:
            LOGGER.warning(
                "checkpoint in %s/ckpt uses fused_adamw=%d optimizer-state layout; "
                "overriding configured fused_adamw=%d to resume it",
                out_dir, int(saved_fused), int(fused),
            )
            fused = saved_fused
        num_steps = int(cfg.get("num_train_steps", 1000))
        schedule = get_schedule(
            cfg.get("decay", "cosine"),
            float(cfg.get("learning_rate", 5e-5)),
            num_steps,
            warmup_ratio=float(cfg.get("warmup_ratio", 0.1)),
        )
        kwargs = {}
        if no_decay_patterns is not None:
            kwargs["no_decay_patterns"] = no_decay_patterns
        self.tx, _ = build_optimizer(
            self.init_params,
            schedule,
            weight_decay=float(cfg.get("weight_decay", 0.01)),
            betas=tuple(cfg.get("betas", (0.9, 0.98))),
            lr_mul=float(cfg.get("lr_mul", 1.0)),
            lr_mul_prefix=cfg.get("lr_mul_prefix", ""),
            max_grad_norm=float(cfg.get("grad_norm", 1.0)),
            grad_accum_steps=int(cfg.get("gradient_accumulation_steps", 1)),
            frozen_patterns=tuple(cfg.get("frozen_patterns", ())),
            **kwargs,
            fused=fused,
            moment_dtype=_moment_dtype(cfg),
        )
        pd = _param_dtype(cfg)
        if pd is not None:
            # --param_dtype bf16: store fwd/bwd params reduced-precision with
            # fp32 masters inside the optimizer state (optim.master_weights)
            self.init_params = cast_params_for_storage(self.init_params, pd)
            self.tx = master_weights(self.tx)
        self.num_train_steps = num_steps * int(cfg.get("gradient_accumulation_steps", 1))
        self.param_shardings, opt_shardings = resolve_shardings(
            cfg, self.tx, self.init_params, self.mesh
        )
        self.steps_per_call = max(1, int(cfg.get("steps_per_call", 1)))
        self.train_step = make_model_train_step(
            apply_fn, self.tx, self.mesh, metric_keys=metric_keys,
            opt_state_shardings=opt_shardings,
            param_shardings=self.param_shardings,
            steps_per_call=self.steps_per_call,
        )
    def train(self) -> TrainState:
        # ambient mesh so model-internal P-based sharding constraints
        # (e.g. Swin3D context_parallel_axis) resolve during the step trace
        with self.mesh:
            return self._train()

    def _train(self) -> TrainState:
        cfg = self.cfg
        state = TrainState.create(self.init_params, self.tx)
        restored = self.ckpt.restore(jax.tree_util.tree_map(np.asarray, state))
        if restored is not None:
            state = restored
        start_step = int(state.step)
        rng = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 1)
        def on_log(step, metrics, sps):
            loss = float(metrics["loss"])
            self.meter(loss)
            LOGGER.info("step %d/%d loss %.4f | %.2f steps/s", step, self.num_train_steps, loss, sps)
            scalars = {k: float(v) for k, v in metrics.items() if np.ndim(v) == 0}
            scalars["steps_per_s"] = sps
            self.writer.log_scalar_dict(scalars, prefix="train", step=step)

        def on_validate(step, state):
            if self.eval_fn is None:
                return
            report = self.eval_fn(state.params)
            score = report.get("score", 0.0)
            self.best.maybe_save(step, score, jax.tree_util.tree_map(np.asarray, state.params))
            self.writer.log_scalar_dict(
                {k: v for k, v in report.items() if np.ndim(v) == 0}, prefix="val", step=step
            )

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
            log_every=int(cfg.get("log_steps", 20)),
            valid_every=int(cfg.get("valid_steps", 500)),
            save_every=int(cfg.get("save_steps", 500)),
            on_log=on_log,
            on_validate=on_validate,
            on_save=on_save,
            on_step=(lambda s: self.ckpt.poll()) if self.ckpt.async_save else None,
            profile_dir=f"{cfg.get('output_dir', '/tmp/xpt_output')}/profile",
            profile_start_step=int(cfg.get("profile_start_step", 3)),
            profile_num_steps=int(cfg.get("profile_steps", 0)),
        )
        self.writer.flush()
        self.ckpt.wait()  # drain any in-flight async checkpoint
        return state
