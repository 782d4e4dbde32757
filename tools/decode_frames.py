"""Dataset tooling: dump video frames to image files or .npy clips.

The reference's ``decode_frames.py`` (frame dumps for ActivityNet/DiDeMo/
LSMDC) and gif→mp4 flow (the native transcoder reads gif directly), on the
native libav reader.

Usage:
    python tools/decode_frames.py --video_root vids/ --out_root frames/ \
        [--fps 1 | --num_frames 32] [--format jpg|npy] [--height 240]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xpretrain_tpu.data.video_reader import probe, read_frames  # noqa: E402

VIDEO_EXTS = (".mp4", ".webm", ".mkv", ".avi", ".mov", ".gif")


def dump_video(src: str, out_dir_or_file: str, fps: float | None, num_frames: int | None,
               fmt: str, height: int, size=None) -> int:
    info = probe(src)
    if num_frames:
        idx = np.linspace(0, max(info.num_frames - 1, 0), num_frames).astype(np.int64)
    else:
        step = max(info.fps / (fps or 1.0), 1.0)
        idx = np.arange(0, info.num_frames, step).astype(np.int64)
    out_hw = None
    if size:
        # exact (H, W) — pack at the training transform's resize target so
        # the loader's resize short-circuits to identity (PERF.md)
        out_hw = (int(size[0]), int(size[1]))
    elif height > 0 and info.height:
        out_hw = (height, int(info.width * height / info.height) // 2 * 2)
    frames = read_frames(src, idx, out_hw=out_hw)
    if fmt == "npy":
        os.makedirs(os.path.dirname(out_dir_or_file) or ".", exist_ok=True)
        np.save(out_dir_or_file + ".npy", frames)
    else:
        import cv2

        os.makedirs(out_dir_or_file, exist_ok=True)
        for i, frame in enumerate(frames):
            cv2.imwrite(
                os.path.join(out_dir_or_file, f"frame_{i:05d}.jpg"),
                cv2.cvtColor(frame, cv2.COLOR_RGB2BGR),
            )
    return len(frames)


def main(argv=None):
    p = argparse.ArgumentParser(description="dump frames from videos")
    p.add_argument("--video_root", required=True)
    p.add_argument("--out_root", required=True)
    p.add_argument("--fps", type=float, default=0.0)
    p.add_argument("--num_frames", type=int, default=0)
    p.add_argument("--format", choices=["jpg", "npy"], default="jpg")
    p.add_argument("--height", type=int, default=0)
    p.add_argument("--size", type=int, nargs=2, default=None, metavar=("H", "W"),
                   help="exact output (H, W) — pack at the training "
                        "transform's resize target")
    args = p.parse_args(argv)
    total = 0
    for dirpath, _dirs, files in os.walk(args.video_root):
        for name in files:
            if not name.lower().endswith(VIDEO_EXTS):
                continue
            src = os.path.join(dirpath, name)
            rel = os.path.splitext(os.path.relpath(src, args.video_root))[0]
            out = os.path.join(args.out_root, rel)
            total += dump_video(src, out, args.fps or None, args.num_frames or None,
                                args.format, args.height, size=args.size)
    print(f"dumped {total} frames")


if __name__ == "__main__":
    main()
