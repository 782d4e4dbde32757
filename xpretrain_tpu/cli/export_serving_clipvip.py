"""Export a CLIP-ViP retrieval checkpoint as an AOT serving artifact.

The reference's serving story is "ship the repo + torch checkpoint and run
``run_video_retrieval.py`` in eval mode" (ref
``CLIP-ViP/src/tasks/run_video_retrieval.py:105-117``). This tool replaces
that with a one-file deployment unit: it builds the model from the same
shared config surface the runners use (``--clip_size``, ``--num_frm``,
``--crop_img_size``, ``--max_txt_len``, ``--bf16``), loads torch weights
via the tested converter (``--clip_weights`` / ``--e2e_weights_path``),
and writes a serialized ``.xpsa`` artifact any jax host can serve with no
model code (``xpretrain_tpu.serving.load_artifact``).

Example::

    python -m xpretrain_tpu.cli.export_serving_clipvip \
        --clip_size base_32 --e2e_weights_path /ckpts/clipvip_b32.pt \
        --output /deploy/clipvip_b32.xpsa --platforms tpu cpu
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from xpretrain_tpu.cli.shared_args import build_shared_parser, parse_args
from xpretrain_tpu.models.clip_vip import CLIPViPModel
from xpretrain_tpu.serving import export_retrieval_towers, save_artifact
from xpretrain_tpu.train.trainer import clip_vip_config_from

LOGGER = logging.getLogger(__name__)


def build_variables(cfg, model: CLIPViPModel, frames: int, image: int, seq: int):
    video = jnp.zeros((1, frames, image, image, 3), jnp.uint8)
    ids = jnp.zeros((1, seq), jnp.int32).at[:, 0].set(49406).at[:, 1].set(49407)
    variables = model.init(jax.random.PRNGKey(int(cfg.get("seed", 0))), video, ids, ids > 0)

    path = cfg.get("e2e_weights_path") or cfg.get("clip_weights")
    if path:
        from xpretrain_tpu.models.clip_vip.convert import (
            load_torch_checkpoint,
            merge_pretrained,
            torch_clip_to_flax,
        )

        converted = torch_clip_to_flax(
            load_torch_checkpoint(path),
            n_text_layers=model.config.text.num_hidden_layers,
            n_vision_layers=model.config.vision.num_hidden_layers,
            temporal_size=model.config.vip.temporal_size,
        )
        variables = merge_pretrained(variables, converted)
        LOGGER.info("loaded pretrained weights from %s", path)
    else:
        LOGGER.warning("no --clip_weights/--e2e_weights_path: exporting INIT weights")
    return variables


def main(argv=None):
    parser = build_shared_parser("Export CLIP-ViP retrieval towers as a serving artifact")
    parser.add_argument("--output", type=str, required=True, help=".xpsa output path")
    parser.add_argument(
        "--platforms", type=str, nargs="*", default=None,
        help="export platforms (e.g. 'tpu cpu' for a multi-platform artifact); "
             "default: this machine's native platform",
    )
    parser.add_argument(
        "--fp_input", action="store_true",
        help="export the fp32 [B,T,C,H,W] input path instead of uint8 [B,T,H,W,3]",
    )
    parser.add_argument(
        "--pallas_attention", action="store_true",
        help="keep the fused Pallas proxy-attention kernel in the artifact "
             "(faster on TPU; pins the artifact to TPU via tpu_custom_call)",
    )
    cfg = parse_args(parser, argv)

    frames = int(cfg.get("num_frm", 12))
    image = int(cfg.get("crop_img_size", 224))
    seq = int(cfg.get("max_txt_len", 70))

    model = CLIPViPModel(clip_vip_config_from(cfg))
    variables = build_variables(cfg, model, frames, image, seq)
    artifact = export_retrieval_towers(
        model,
        variables,
        frames=frames,
        image_size=image,
        seq_len=seq,
        video_dtype=jnp.float32 if cfg.get("fp_input") else jnp.uint8,
        platforms=cfg.get("platforms") or None,
        use_pallas_attention=bool(cfg.get("pallas_attention")),
    )
    save_artifact(cfg.output, artifact)
    LOGGER.info(
        "wrote %s (platforms=%s, frames=%d, image=%d, seq=%d)",
        cfg.output, artifact.meta["platforms"], frames, image, seq,
    )
    return artifact.meta


if __name__ == "__main__":
    main()
