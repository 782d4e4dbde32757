"""Dataset tooling: TGIF-style gif -> mp4 conversion.

The reference converts TGIF's animated gifs to mp4 before training
(``hd-vila/scripts/process_raw_video/gif2mp4.py``) so the normal video
decode path applies. Same here: libav demuxes gif natively, so this is the
native transcoder (``native/transcoder.cpp``) pointed at .gif inputs with an
mp4 container out, parallelized with a thread pool.

Usage:
    python tools/gif2mp4.py --in_root gifs/ --out_root mp4s/ [--fps 10]
"""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.compress_videos import transcode  # noqa: E402


def gif2mp4(in_path: str, out_path: str, fps: float = 10.0, height: int = 0) -> bool:
    """Convert one gif; TGIF gifs are ~10 fps, which is also the default."""
    return transcode(in_path, out_path, fps=fps, height=height)


def main(argv=None):
    p = argparse.ArgumentParser(description="gif -> mp4 conversion")
    p.add_argument("--in_root", required=True)
    p.add_argument("--out_root", required=True)
    p.add_argument("--fps", type=float, default=10.0)
    p.add_argument("--height", type=int, default=0)
    p.add_argument("--workers", type=int, default=os.cpu_count())
    args = p.parse_args(argv)

    jobs = []
    for dirpath, _dirs, files in os.walk(args.in_root):
        for name in files:
            if name.lower().endswith(".gif"):
                src = os.path.join(dirpath, name)
                rel = os.path.splitext(os.path.relpath(src, args.in_root))[0] + ".mp4"
                jobs.append((src, os.path.join(args.out_root, rel)))

    def run(job):
        src, dst = job
        ok = gif2mp4(src, dst, fps=args.fps, height=args.height)
        return src, ok

    n_ok = 0
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        for src, ok in pool.map(run, jobs):
            n_ok += bool(ok)
            if not ok:
                print(f"FAILED: {src}", file=sys.stderr)
    print(f"converted {n_ok}/{len(jobs)} gifs")
    return 0 if n_ok == len(jobs) else 1


if __name__ == "__main__":
    raise SystemExit(main())
