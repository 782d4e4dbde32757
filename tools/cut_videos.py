"""Dataset tooling: stream-copy clip extraction driven by jsonl metadata.

The HD-VILA-100M clip cutter (``hd-vila-100m/src/cut_videos.py:27-109``):
input jsonl rows ``{"video_id": ..., "clip": [{"clip_id": ...,
"span": ["HH:MM:SS.mmm", "HH:MM:SS.mmm"]}, ...]}`` (schema documented at
``hd-vila-100m/README.md:31-43``); each span is extracted without
re-encoding via the native libavformat cutter (``native/clip_cutter.cpp``).

Usage:
    python tools/cut_videos.py --meta meta.jsonl --video_root vids/ --out_root clips/
"""

from __future__ import annotations

import argparse
import ctypes
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xpretrain_tpu.data.video_reader import _load_lib  # noqa: E402
from xpretrain_tpu.utils.basic import load_jsonl, save_jsonl  # noqa: E402


def parse_timestamp(ts: str) -> float:
    """'HH:MM:SS.mmm' (or seconds) -> float seconds."""
    if ":" not in str(ts):
        return float(ts)
    parts = str(ts).split(":")
    secs = 0.0
    for p in parts:
        secs = secs * 60 + float(p)
    return secs


def cut_clip(in_path: str, out_path: str, start_s: float, end_s: float) -> bool:
    lib = _load_lib()
    if not lib:
        raise RuntimeError("native/build/libxvr.so not built — run `make -C native`")
    if not hasattr(lib, "_xvc_configured"):
        lib.xvc_cut.restype = ctypes.c_int
        lib.xvc_cut.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double, ctypes.c_double]
        lib._xvc_configured = True
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    return lib.xvc_cut(in_path.encode(), out_path.encode(), start_s, end_s) == 0


def cut_all(meta_path: str, video_root: str, out_root: str, ext: str = ".mp4") -> list[dict]:
    rows = load_jsonl(meta_path)
    results = []
    for row in rows:
        video_id = row["video_id"]
        src = os.path.join(video_root, video_id)
        if not os.path.exists(src):
            for cand_ext in (".mp4", ".webm", ".mkv", ".avi"):
                if os.path.exists(src + cand_ext):
                    src = src + cand_ext
                    break
        for clip in row.get("clip", []):
            start_s = parse_timestamp(clip["span"][0])
            end_s = parse_timestamp(clip["span"][1])
            out_path = os.path.join(out_root, clip["clip_id"] + ext)
            ok = cut_clip(src, out_path, start_s, end_s)
            results.append(
                {"clip_id": clip["clip_id"], "ok": ok, "span_s": [start_s, end_s]}
            )
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description="stream-copy clip extraction")
    p.add_argument("--meta", required=True)
    p.add_argument("--video_root", required=True)
    p.add_argument("--out_root", required=True)
    p.add_argument("--report", default="")
    args = p.parse_args(argv)
    results = cut_all(args.meta, args.video_root, args.out_root)
    ok = sum(r["ok"] for r in results)
    print(f"cut {ok}/{len(results)} clips")
    if args.report:
        save_jsonl(results, args.report)


if __name__ == "__main__":
    main()
