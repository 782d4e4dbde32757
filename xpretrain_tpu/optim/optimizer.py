"""AdamW with the reference's 4-way param grouping, built on optax.

Mirrors ``CLIP-ViP/src/optimization/utils.py:96-154``: params are split into
(top-prefix × lr-mul) × (decay / no-decay) groups, where no-decay covers
biases, LayerNorm params and ``logit_scale``; LF-VILA additionally exempts
position embeddings and relative-position-bias tables
(``LF-VILA/src/optimization/optimizer.py:6-31``). Decoupled weight decay
matches the hand-copied HF AdamW (``adamw.py:11``): decay is applied with the
*scheduled* lr, which optax.adamw also does.

ZeRO-2 note: optimizer-state sharding is not done here — the train-step
factory annotates the optax state with shardings over the mesh
(see ``parallel/train_step.py``), which is the pjit-native equivalent of
DeepSpeed ZeRO-2 partitioning.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

import jax
import optax

NO_DECAY_DEFAULT = ("bias", "layer_norm", "layernorm", "_norm", "norm_", "logit_scale")
NO_DECAY_LFVILA = NO_DECAY_DEFAULT + ("pos_embed", "position_embedding", "relative_position_bias")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path).lower()


def _is_no_decay(path_s: str, leaf, patterns: Sequence[str]) -> bool:
    if leaf is not None and getattr(leaf, "ndim", 2) <= 1:
        # 1-D params are biases/norm scales/embedding-like vectors; the
        # reference's name patterns reduce to exactly this on our trees,
        # plus explicit pattern hits below for e.g. 2-D bias tables.
        return True
    return any(p in path_s for p in patterns)


def param_group_labels(
    params: Any,
    lr_mul_prefix: str = "",
    no_decay_patterns: Sequence[str] = NO_DECAY_DEFAULT,
    frozen_patterns: Sequence[str] = (),
) -> Any:
    """Label tree: frozen | {top_,base_} x {decay,no_decay} per leaf.

    ``frozen_patterns`` implements the reference's stage freezing (stage-1
    modules frozen during stage-2 pretraining, ``e2e_model.py:188-206``,
    ``lfvila_pretrain.py:82-97``; text-encoder freezing ``VidCLIP.py:96-103``)
    as an optimizer concern: matched params receive zero updates.
    """

    def label(path, leaf):
        path_s = _path_str(path)
        if any(p.lower() in path_s for p in frozen_patterns):
            return "frozen"
        top = bool(lr_mul_prefix) and lr_mul_prefix.lower() in path_s
        nd = _is_no_decay(path_s, leaf, no_decay_patterns)
        return ("top_" if top else "base_") + ("no_decay" if nd else "decay")

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    params: Any,
    schedule: Callable,
    weight_decay: float = 0.2,
    betas: tuple[float, float] = (0.9, 0.98),
    eps: float = 1e-6,
    lr_mul: float = 1.0,
    lr_mul_prefix: str = "",
    max_grad_norm: float | None = 2.0,
    no_decay_patterns: Sequence[str] = NO_DECAY_DEFAULT,
    grad_accum_steps: int = 1,
    frozen_patterns: Sequence[str] = (),
) -> tuple[optax.GradientTransformation, Any]:
    """Build the grouped AdamW; returns (tx, labels).

    ``schedule`` maps step -> base lr; the top groups use ``lr_mul * lr``.
    Global-norm clipping runs before Adam (the reference clips master grads
    at ``run_pretrain.py:408-411``). ``frozen_patterns`` zero out updates
    (stage-freezing, see :func:`param_group_labels`).
    """

    def adamw(mul: float, wd: float) -> optax.GradientTransformation:
        return optax.adamw(
            learning_rate=lambda step: schedule(step) * mul,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=wd,
        )

    labels = param_group_labels(params, lr_mul_prefix, no_decay_patterns, frozen_patterns)
    tx = optax.multi_transform(
        {
            "base_decay": adamw(1.0, weight_decay),
            "base_no_decay": adamw(1.0, 0.0),
            "top_decay": adamw(lr_mul, weight_decay),
            "top_no_decay": adamw(lr_mul, 0.0),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    chain = []
    if max_grad_norm is not None and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(tx)
    out = optax.chain(*chain)
    if grad_accum_steps > 1:
        out = optax.MultiSteps(out, every_k_schedule=grad_accum_steps)
    return out, labels


def build_multi_schedule_optimizer(
    params: Any,
    groups: Mapping[str, tuple[Sequence[str], Callable]],
    default_schedule: Callable,
    weight_decay: float = 0.01,
    betas: tuple[float, float] = (0.9, 0.98),
    eps: float = 1e-6,
    max_grad_norm: float | None = 1.0,
    no_decay_patterns: Sequence[str] = NO_DECAY_DEFAULT,
) -> tuple[optax.GradientTransformation, Any]:
    """AdamW with independent LR schedules per named param group.

    The HD-VILA pattern of three schedules over transformer/cnn/align groups
    (ref ``hd-vila/src/pretrain/run_pretrain_stage1_group.py:402-437``):
    ``groups`` maps a group name to (path substrings, schedule); params not
    matching any group use ``default_schedule``. Each group still splits
    decay/no-decay.
    """

    def label(path, leaf):
        path_s = _path_str(path)
        name = "default"
        for group_name, (patterns, _sched) in groups.items():
            if any(p.lower() in path_s for p in patterns):
                name = group_name
                break
        nd = "_no_decay" if _is_no_decay(path_s, leaf, no_decay_patterns) else "_decay"
        return name + nd

    labels = jax.tree_util.tree_map_with_path(label, params)

    def adamw(schedule, wd):
        return optax.adamw(
            learning_rate=schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd
        )

    transforms = {}
    for name, (_patterns, sched) in list(groups.items()) + [("default", ((), default_schedule))]:
        transforms[name + "_decay"] = adamw(sched, weight_decay)
        transforms[name + "_no_decay"] = adamw(sched, 0.0)
    tx = optax.multi_transform(transforms, labels)
    chain = []
    if max_grad_norm is not None and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(tx)
    return optax.chain(*chain), labels


def clamp_logit_scale(params: Mapping, max_value: float = 5.2983) -> Any:
    """Clamp logit_scale to [0, ln(200)] each step (ref
    ``run_pretrain.py:335-340``: ``torch.clamp_(logit_scale, 0, np.log(200))``)."""
    import jax.numpy as jnp

    def clamp(path, leaf):
        if "logit_scale" in _path_str(path):
            return jnp.clip(leaf, 0.0, max_value)
        return leaf

    return jax.tree_util.tree_map_with_path(clamp, params)
