#!/usr/bin/env python
"""Multi-worker video-ingest throughput benchmark (host pipeline).

The single-host proxy for BASELINE.json config #5 (pod-scale fused
decode/sample/preprocess ingest): a decode pool of threads over independent
native ``xvr`` reader handles (the ctypes call releases the GIL, so decode
overlaps IO even on few cores), each worker running the full per-clip
pipeline — probe, uniform frame sampling, native decode+resize, crop — then
batch collation ready for ``shard_host_batch``. Reports frames/s and
decoded MB/s.

This replaces the reference's decord + torch DataLoader worker parallelism
(``CLIP-ViP/src/datasets/dataloader.py:65-157``, ``n_workers`` per GPU).

Usage:
    python tools/bench_ingest.py [--workers 8] [--clips 64] [--size 224]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def synthesize_videos(
    root: str, n_videos: int, frames: int, hw: tuple[int, int], codec: str = "mjpg"
) -> list[str]:
    """Write benchmark source videos.

    ``mjpg``: cv2 MJPG (intra-only, the easiest decode). ``h264``/``mpeg4``:
    the MJPG source is re-encoded through the native libav transcoder
    (``native/transcoder.cpp`` → system libx264/mpeg4) — cv2's bundled
    ffmpeg has no H.264 encoder in this image, the system libavcodec does.
    HD-VILA-100M is 720p H.264 (``hd-vila-100m/README.md:15``), so the h264
    row is the corpus-representative decode cost.
    """
    import cv2

    paths = []
    h, w = hw
    rng = np.random.default_rng(0)
    for vi in range(n_videos):
        path = os.path.join(root, f"clip{vi}.avi")
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (w, h))
        assert writer.isOpened(), "no cv2 encoder available"
        base = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        for i in range(frames):
            writer.write(np.roll(base, i * 3, axis=1))
        writer.release()
        paths.append(path)
    if codec != "mjpg":
        from tools.compress_videos import transcode

        enc = {"h264": "libx264", "mpeg4": "mpeg4"}[codec]
        out_paths = []
        for p in paths:
            out = p.replace(".avi", f"_{codec}.mp4")
            assert transcode(p, out, fps=30.0, height=0, codec=enc), f"{enc} encode failed"
            out_paths.append(out)
        paths = out_paths
    return paths


def _load_clip_task(args):
    """Module-level worker (picklable for ProcessPoolExecutor)."""
    path, i, num_frm, crop = args
    from xpretrain_tpu.data import video_reader
    from xpretrain_tpu.data.sample_frames import uniform_sample_with_jitter
    from xpretrain_tpu.data.transforms import center_crop

    info = video_reader.probe(path)
    rng = np.random.default_rng(i)
    idx = uniform_sample_with_jitter(info.num_frames, num_frm, rng)
    frames = video_reader.read_frames(path, idx, out_hw=(crop, crop * 4 // 3))
    return center_crop(frames, (crop, crop))


def run_benchmark(
    workers: int = 8,
    clips: int = 64,
    num_frm: int = 12,
    crop: int = 224,
    src_hw: tuple[int, int] = (256, 320),
    src_frames: int = 120,
    n_videos: int = 8,
    codec: str = "mjpg",
    mode: str = "thread",
) -> dict:
    """One ingest row. ``mode='thread'`` shares the process (ctypes decode
    releases the GIL); ``mode='process'`` is the torch-DataLoader-style
    worker-process variant (fork + pickle per clip)."""
    with tempfile.TemporaryDirectory() as root:
        paths = synthesize_videos(root, n_videos, src_frames, src_hw, codec=codec)
        tasks = [(paths[i % len(paths)], i, num_frm, crop) for i in range(clips)]

        # warm (file cache + lib init)
        _load_clip_task(tasks[0])

        t0 = time.perf_counter()
        pool_cls = ProcessPoolExecutor if mode == "process" else ThreadPoolExecutor
        with pool_cls(max_workers=workers) as pool:
            results = list(pool.map(_load_clip_task, tasks))
        batch = np.stack(results)  # collate [clips, F, H, W, 3] u8
        wall = time.perf_counter() - t0

    total_frames = clips * num_frm
    mb = batch.nbytes / 1e6
    return {
        "metric": "ingest_pipeline",
        "codec": codec,
        "mode": mode,
        "workers": workers,
        "clips": clips,
        "frames_per_s": round(total_frames / wall, 1),
        "clips_per_s": round(clips / wall, 2),
        "decoded_MB_per_s": round(mb / wall, 1),
        "wall_s": round(wall, 3),
        "host_cpus": os.cpu_count(),
        "batch_shape": list(batch.shape),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--clips", type=int, default=64)
    ap.add_argument("--num_frm", type=int, default=12)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--codec", default="mjpg", choices=["mjpg", "h264", "mpeg4"])
    ap.add_argument("--mode", default="thread", choices=["thread", "process"])
    ap.add_argument("--matrix", action="store_true",
                    help="run the full codec x mode matrix and print all rows")
    ap.add_argument("--append_perf", default="")
    args = ap.parse_args()
    if args.matrix:
        rows = []
        for codec in ("mjpg", "h264"):
            for mode in ("thread", "process"):
                try:
                    rows.append(run_benchmark(
                        args.workers, args.clips, args.num_frm, args.size,
                        codec=codec, mode=mode))
                    print(json.dumps(rows[-1]), flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{codec}/{mode} failed: {e}", flush=True)
    else:
        rows = [run_benchmark(args.workers, args.clips, args.num_frm, args.size,
                              codec=args.codec, mode=args.mode)]
        print(json.dumps(rows[0]))
    if args.append_perf and rows:
        with open(args.append_perf, "a") as f:
            f.write(
                f"\n## Ingest pipeline (decode pool, {rows[0]['host_cpus']}-cpu host)\n\n"
                f"| codec | mode | workers | clips | frames/s | decoded MB/s |\n"
                f"|---|---|---|---|---|---|\n")
            for row in rows:
                f.write(
                    f"| {row['codec']} | {row['mode']} | {row['workers']} | {row['clips']} "
                    f"| {row['frames_per_s']} | {row['decoded_MB_per_s']} |\n")


if __name__ == "__main__":
    main()
