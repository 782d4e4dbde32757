"""AOT serving artifacts: serialized, ahead-of-time-lowered retrieval towers.

The reference deploys retrieval by shipping the full training stack — Python
model code plus a torch checkpoint that ``run_video_retrieval.py`` restores
at startup (ref ``CLIP-ViP/src/tasks/run_video_retrieval.py:105-117``,
``setup_model``'s ``e2e_weights_path`` restore). On TPU the deployment unit
can instead be a single
**serialized StableHLO artifact**: ``jax.export`` lowers the jitted encoder
closures once — parameters frozen in as constants — and any serving host
deserializes and calls them with no model code, no flax, no checkpoint
restore; only ``jax`` and the artifact file. A symbolic batch dimension
means one artifact serves every request batch size, and the lowered module
is exactly what the training-side jit would have compiled for the same
attention path, so serving numerics match training-side eval bit-for-bit
when the attention paths match: a default (XLA-attention) artifact vs
CPU/XLA-path eval, or a ``use_pallas_attention`` artifact vs TPU training,
whose jit takes the Pallas flash kernel. Across the two paths the math is
the same attention with a different accumulation order — equal to bf16
round-off, not bit-for-bit (measured in ``tests/test_serving_artifact.py``).

Layout of the ``.xpsa`` file (a zip):

- ``video.jaxexp`` / ``text.jaxexp`` — ``jax.export.Exported.serialize()``
  bytes for the video and text towers;
- ``meta.json`` — input shapes/dtypes, projection dim, ``logit_scale``,
  the jax version that produced the artifact.

The exported callables are the retrieval-serving surface:

- video tower: raw ``uint8 [B, T, H, W, 3]`` frames → L2-normalized
  ``[B, proj]`` features (the fused u8 ingest path — the artifact's input
  is exactly what a video decoder produces, `ops/patchify.py`);
- text tower: ``int32 [B, seq]`` token ids + ``[B, seq]`` mask →
  L2-normalized ``[B, proj]`` features.

Ranking is then a plain matmul the caller owns:
``scores = text_feats @ video_feats.T`` (optionally scaled by
``exp(meta["logit_scale"])`` for calibrated logits).

Portability notes: exports default to the machine's native platform; pass
``platforms=("tpu", "cpu")`` for a multi-platform artifact. Configs that
route proxy attention through the Pallas kernel embed a
``tpu_custom_call`` — serializing those requires opting in via
``disabled_checks=(jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call"),)``
and pins the artifact to TPU; the default XLA attention path is fully
portable.
"""

from __future__ import annotations

import dataclasses
import json
import zipfile
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array

_VIDEO_MEMBER = "video.jaxexp"
_TEXT_MEMBER = "text.jaxexp"
_META_MEMBER = "meta.json"

FORMAT_VERSION = 1


@dataclasses.dataclass
class RetrievalArtifact:
    """A pair of deserialized retrieval towers plus their metadata.

    ``encode_video`` / ``encode_text`` jit the exported calls on first use
    (compiled once per concrete batch size; the symbolic-batch export means
    any batch size retraces cheaply without re-lowering the model).

    ``encode_video`` is variadic: CLIP-ViP and LF-VILA towers take one
    video tensor; HD-VILA's hybrid tower takes ``(img_middle, img_other)``
    (``meta["family"]`` says which, ``meta`` records the expected shapes).
    """

    video: jax.export.Exported
    text: jax.export.Exported
    meta: dict[str, Any]

    def __post_init__(self) -> None:
        self._video_call = jax.jit(self.video.call)
        self._text_call = jax.jit(self.text.call)

    def encode_video(self, *video: Array) -> Array:
        return self._video_call(*video)

    def encode_text(self, input_ids: Array, attention_mask: Array) -> Array:
        return self._text_call(input_ids, attention_mask)

    def similarity(self, text_feats: Array, video_feats: Array, scaled: bool = False) -> Array:
        """[Nt, Nv] retrieval scores; ``scaled`` applies exp(logit_scale)
        (CLIP-ViP) or 1/temp (HD-VILA / LF-VILA)."""
        scores = jnp.asarray(text_feats) @ jnp.asarray(video_feats).T
        if scaled:
            if "logit_scale" in self.meta:
                scores = scores * float(jnp.exp(self.meta["logit_scale"]))
            elif "temp" in self.meta:
                scores = scores / float(self.meta["temp"])
        return scores


def _export_pair(
    video_fn, video_specs: tuple, text_fn, text_specs: tuple,
    platforms: Sequence[str] | None, disabled_checks: Sequence[Any],
) -> tuple[jax.export.Exported, jax.export.Exported]:
    """Lower both towers with shared export kwargs (symbolic batch dim)."""
    kwargs: dict[str, Any] = {"disabled_checks": tuple(disabled_checks)}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    video_exp = jax.export.export(jax.jit(video_fn), **kwargs)(*video_specs)
    text_exp = jax.export.export(jax.jit(text_fn), **kwargs)(*text_specs)
    return video_exp, text_exp


def export_hdvila_retrieval_towers(
    model,
    variables: Mapping[str, Any],
    *,
    n_clips: int = 2,
    n_hi_frames: int = 1,
    n_lo_frames: int = 6,
    hi_size: tuple[int, int] = (640, 1024),
    lo_size: tuple[int, int] = (160, 256),
    seq_len: int = 50,
    platforms: Sequence[str] | None = None,
    disabled_checks: Sequence[Any] = (),
) -> RetrievalArtifact:
    """Lower an ``HdVilaPretrainModel``'s stage-1 ITC towers to an artifact.

    The reference serves HD-VILA retrieval by restoring the torch checkpoint
    into the training stack (``hd-vila/src/tasks/run_video_retrieval.py``,
    ``e2e_weights_path``); here the dual-encoder towers export standalone.
    Video tower input is the hybrid pair the collator produces:
    ``img_middle [B, clips, 3·n_hi, H, W]`` high-res middles +
    ``img_other [B, clips, n_lo, 3, h, w]`` low-res context frames.
    """
    def _video(img_middle: Array, img_other: Array) -> Array:
        return model.apply(variables, img_middle, img_other,
                           method=type(model).forward_video)

    def _text(input_ids: Array, attention_mask: Array) -> Array:
        return model.apply(variables, input_ids, attention_mask,
                           method=type(model).forward_text)

    (b,) = jax.export.symbolic_shape("b")
    mid_spec = jax.ShapeDtypeStruct(
        (b, n_clips, 3 * n_hi_frames, *hi_size), jnp.float32)
    oth_spec = jax.ShapeDtypeStruct(
        (b, n_clips, n_lo_frames, 3, *lo_size), jnp.float32)
    ids_spec = jax.ShapeDtypeStruct((b, seq_len), jnp.int32)
    mask_spec = jax.ShapeDtypeStruct((b, seq_len), jnp.int32)
    video_exp, text_exp = _export_pair(
        _video, (mid_spec, oth_spec), _text, (ids_spec, mask_spec),
        platforms, disabled_checks)
    meta = {
        "format_version": FORMAT_VERSION,
        "family": "hd_vila",
        "n_clips": n_clips,
        "n_hi_frames": n_hi_frames,
        "n_lo_frames": n_lo_frames,
        "hi_size": list(hi_size),
        "lo_size": list(lo_size),
        "seq_len": seq_len,
        "temp": float(getattr(model, "temp", 0.05)),
        "attention": "xla",
        "platforms": list(video_exp.platforms),
        "jax_version": jax.__version__,
    }
    return RetrievalArtifact(video=video_exp, text=text_exp, meta=meta)


def export_lfvila_retrieval_towers(
    model,
    variables: Mapping[str, Any],
    *,
    frames: int = 32,
    image_size: tuple[int, int] = (192, 320),
    n_sent: int = 4,
    sent_len: int = 50,
    platforms: Sequence[str] | None = None,
    disabled_checks: Sequence[Any] = (),
) -> RetrievalArtifact:
    """Lower an ``LfVilaRetrieval``'s dual-encoder towers to an artifact.

    Reference deployment restores the DeepSpeed checkpoint into the training
    stack (``LF-VILA/src/tasks/run_retrieval.py``); here the Swin3D/HTWA
    video tower and the hierarchical text tower export standalone. Video
    input ``[B, 3, N, H, W]`` float frames, text ``[B, M, L]`` sentence ids.
    """
    def _video(video_frames: Array) -> Array:
        return model.apply(variables, video_frames, method=type(model).forward_video)

    def _text(text_ids: Array, attention_mask: Array) -> Array:
        return model.apply(variables, text_ids, attention_mask,
                           method=type(model).forward_text)

    (b,) = jax.export.symbolic_shape("b")
    vid_spec = jax.ShapeDtypeStruct((b, 3, frames, *image_size), jnp.float32)
    ids_spec = jax.ShapeDtypeStruct((b, n_sent, sent_len), jnp.int32)
    mask_spec = jax.ShapeDtypeStruct((b, n_sent, sent_len), jnp.int32)
    video_exp, text_exp = _export_pair(
        _video, (vid_spec,), _text, (ids_spec, mask_spec),
        platforms, disabled_checks)
    meta = {
        "format_version": FORMAT_VERSION,
        "family": "lf_vila",
        "frames": frames,
        "image_size": list(image_size),
        "n_sent": n_sent,
        "sent_len": sent_len,
        "temp": float(model.config.temp),
        "attention": "xla",
        "platforms": list(video_exp.platforms),
        "jax_version": jax.__version__,
    }
    return RetrievalArtifact(video=video_exp, text=text_exp, meta=meta)


def export_retrieval_towers(
    model,
    variables: Mapping[str, Any],
    *,
    frames: int,
    image_size: int,
    seq_len: int,
    video_dtype: Any = jnp.uint8,
    platforms: Sequence[str] | None = None,
    disabled_checks: Sequence[Any] = (),
    use_pallas_attention: bool = False,
) -> RetrievalArtifact:
    """Lower a ``CLIPViPModel``'s towers to a serializable artifact.

    ``variables`` is the full ``{"params": ...}`` tree; it is closed over,
    so the exported modules embed the weights as constants. The batch
    dimension is symbolic ("b"): one export serves every batch size.

    By default the artifact traces the pure-XLA proxy-attention path so it
    is portable to any export platform. ``use_pallas_attention=True``
    *forces* the fused Pallas kernel at trace time (faster on TPU, PERF.md)
    regardless of the export host's backend — that embeds a
    ``tpu_custom_call``, pins the artifact to TPU (``platforms`` is forced
    to ``("tpu",)``; passing anything else raises), and implies the
    corresponding ``DisabledSafetyCheck`` (added automatically unless you
    pass your own ``disabled_checks``).
    """
    # Import here: serving hosts that only *load* artifacts never pull flax.
    from xpretrain_tpu.models.clip_vip.model import CLIPViPModel
    from xpretrain_tpu.ops.proxy_attention import (
        force_pallas_attention,
        force_xla_attention,
    )

    if use_pallas_attention:
        if not disabled_checks:
            disabled_checks = (jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call"),)
        # the Pallas custom-call only lowers/runs on TPU: pin the artifact so
        # loaders can detect it from meta["platforms"], and refuse platform
        # lists that promise portability the module cannot deliver
        if platforms is not None and tuple(platforms) != ("tpu",):
            raise ValueError(
                f"use_pallas_attention embeds a tpu_custom_call; platforms must be "
                f"('tpu',), got {tuple(platforms)}"
            )
        platforms = ("tpu",)

    def _video(video: Array) -> Array:
        return model.apply(variables, video, method=CLIPViPModel.forward_video)

    def _text(input_ids: Array, attention_mask: Array) -> Array:
        return model.apply(
            variables, input_ids, attention_mask, method=CLIPViPModel.forward_text
        )

    (b,) = jax.export.symbolic_shape("b")
    if video_dtype == jnp.uint8:
        video_spec = jax.ShapeDtypeStruct((b, frames, image_size, image_size, 3), jnp.uint8)
    else:
        # fp path takes channel-first clips ([B,T,C,H,W], the torch layout).
        video_spec = jax.ShapeDtypeStruct((b, frames, 3, image_size, image_size), video_dtype)
    ids_spec = jax.ShapeDtypeStruct((b, seq_len), jnp.int32)
    mask_spec = jax.ShapeDtypeStruct((b, seq_len), jnp.int32)

    kwargs: dict[str, Any] = {"disabled_checks": tuple(disabled_checks)}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    # force the path explicitly in both directions: the backend-driven
    # default would silently embed the XLA path when exporting from a
    # non-TPU host with use_pallas_attention=True (and vice versa)
    path_ctx = force_pallas_attention if use_pallas_attention else force_xla_attention
    with path_ctx():
        video_exp = jax.export.export(jax.jit(_video), **kwargs)(video_spec)
    text_exp = jax.export.export(jax.jit(_text), **kwargs)(ids_spec, mask_spec)

    cfg = model.config
    logit_scale = float(jnp.asarray(variables["params"]["logit_scale"]))
    meta = {
        "format_version": FORMAT_VERSION,
        "family": "clip_vip",
        "frames": frames,
        "image_size": image_size,
        "seq_len": seq_len,
        "video_dtype": jnp.dtype(video_dtype).name,
        "projection_dim": int(cfg.projection_dim),
        "attention": "pallas" if use_pallas_attention else "xla",
        "logit_scale": logit_scale,
        "platforms": list(video_exp.platforms),
        "jax_version": jax.__version__,
    }
    return RetrievalArtifact(video=video_exp, text=text_exp, meta=meta)


def save_artifact(path: str, artifact: RetrievalArtifact) -> None:
    """Write the artifact as one ``.xpsa`` zip (see module docstring).

    Streams members straight into the output file — a large_14 fp32 export
    holds multi-GB serialized towers, so no whole-zip BytesIO copy."""
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_VIDEO_MEMBER, bytes(artifact.video.serialize()))
        zf.writestr(_TEXT_MEMBER, bytes(artifact.text.serialize()))
        zf.writestr(_META_MEMBER, json.dumps(artifact.meta, indent=2))


def load_artifact(path: str) -> RetrievalArtifact:
    """Deserialize an ``.xpsa`` artifact — no model code or flax needed."""
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        missing = {_VIDEO_MEMBER, _TEXT_MEMBER, _META_MEMBER} - names
        if missing:
            raise ValueError(f"{path}: not a serving artifact (missing {sorted(missing)})")
        meta = json.loads(zf.read(_META_MEMBER))
        if meta.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"{path}: artifact format v{meta['format_version']} is newer than "
                f"this reader (v{FORMAT_VERSION}) — upgrade xpretrain_tpu"
            )
        video = jax.export.deserialize(bytearray(zf.read(_VIDEO_MEMBER)))
        text = jax.export.deserialize(bytearray(zf.read(_TEXT_MEMBER)))
    return RetrievalArtifact(video=video, text=text, meta=meta)
