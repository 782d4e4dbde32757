"""Dataset tooling: parallel fps-downsampling re-encode.

The hd-vila preprocessing step of re-encoding source videos to 6 fps for
storage/IO efficiency (``hd-vila/scripts/process_raw_video/compress_video.py``),
on the native libav transcoder (``native/transcoder.cpp``) instead of an
ffmpeg binary, with a thread pool standing in for joblib.

Usage:
    python tools/compress_videos.py --in_root vids/ --out_root vids_6fps/ --fps 6
"""

from __future__ import annotations

import argparse
import ctypes
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xpretrain_tpu.data.video_reader import _load_lib  # noqa: E402

VIDEO_EXTS = (".mp4", ".webm", ".mkv", ".avi", ".mov")


def transcode(in_path: str, out_path: str, fps: float = 6.0, height: int = 0,
              codec: str = "") -> bool:
    lib = _load_lib()
    if not lib:
        raise RuntimeError("native/build/libxvr.so not built — run `make -C native`")
    if not hasattr(lib, "_xvc_t_configured"):
        lib.xvc_transcode.restype = ctypes.c_int
        lib.xvc_transcode.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double, ctypes.c_int, ctypes.c_char_p
        ]
        lib._xvc_t_configured = True
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    return lib.xvc_transcode(in_path.encode(), out_path.encode(), fps, height, codec.encode()) == 0


def main(argv=None):
    p = argparse.ArgumentParser(description="fps-downsampling re-encode")
    p.add_argument("--in_root", required=True)
    p.add_argument("--out_root", required=True)
    p.add_argument("--fps", type=float, default=6.0)
    p.add_argument("--height", type=int, default=0)
    p.add_argument("--codec", type=str, default="")
    p.add_argument("--workers", type=int, default=os.cpu_count())
    args = p.parse_args(argv)

    jobs = []
    for dirpath, _dirs, files in os.walk(args.in_root):
        for name in files:
            if name.lower().endswith(VIDEO_EXTS):
                src = os.path.join(dirpath, name)
                rel = os.path.relpath(src, args.in_root)
                jobs.append((src, os.path.join(args.out_root, rel)))

    def run(job):
        src, dst = job
        return transcode(src, dst, args.fps, args.height, args.codec)

    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        results = list(pool.map(run, jobs))
    print(f"transcoded {sum(results)}/{len(jobs)} videos")


if __name__ == "__main__":
    main()
