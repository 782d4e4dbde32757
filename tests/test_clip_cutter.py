"""Native stream-copy clip cutter test."""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import sys  # noqa: E402

sys.path.insert(0, "tools")

from xpretrain_tpu.data import video_reader  # noqa: E402


@pytest.fixture(scope="module")
def long_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cut") / "long.avi")
    w, h, n, fps = 64, 48, 100, 10
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    assert writer.isOpened()
    for i in range(n):
        frame = np.zeros((h, w, 3), np.uint8)
        frame[:, :, 0] = min(i * 2, 255)
        writer.write(frame)
    writer.release()
    return path


def test_transcode_6fps(long_video, tmp_path):
    from compress_videos import transcode

    out = str(tmp_path / "six.avi")
    ok = transcode(long_video, out, fps=5.0)
    assert ok
    info = video_reader.probe(out)
    # 10s source at 10fps -> 5fps output ~= 50 frames
    assert 40 <= info.num_frames <= 60
    assert abs(info.fps - 5.0) < 0.5
    frames = video_reader.read_frames(out, np.array([0, 10]))
    # frame 10 at 5fps == 2s == source frame 20 -> blue ~40
    assert frames[1, :, :, 2].mean() > frames[0, :, :, 2].mean() + 20


def test_decode_frames_tool(long_video, tmp_path):
    from decode_frames import dump_video

    n = dump_video(long_video, str(tmp_path / "clip"), fps=None, num_frames=8,
                   fmt="npy", height=24)
    assert n == 8
    arr = np.load(tmp_path / "clip.npy")
    assert arr.shape == (8, 24, 32, 3)

    n2 = dump_video(long_video, str(tmp_path / "jpgs"), fps=5.0, num_frames=None,
                    fmt="jpg", height=0)
    assert n2 == 50
    import os

    assert len(os.listdir(tmp_path / "jpgs")) == 50


def test_cut_and_meta_flow(long_video, tmp_path):
    from cut_videos import cut_all, parse_timestamp

    assert parse_timestamp("00:00:02.500") == 2.5
    assert parse_timestamp("1:01:00") == 3660.0
    assert parse_timestamp("3.25") == 3.25

    meta = tmp_path / "meta.jsonl"
    meta.write_text(
        json.dumps(
            {
                "video_id": "long.avi",
                "clip": [{"clip_id": "long.2.5", "span": ["00:00:02", "00:00:05"]}],
            }
        )
        + "\n"
    )
    import os

    results = cut_all(str(meta), os.path.dirname(long_video), str(tmp_path / "clips"), ext=".avi")
    assert results[0]["ok"]
    out = str(tmp_path / "clips" / "long.2.5.avi")
    info = video_reader.probe(out)
    # ~3 seconds at 10fps, keyframe-aligned start can add frames (MJPG = all
    # keyframes, so expect close to 30)
    assert 25 <= info.num_frames <= 35
    frames = video_reader.read_frames(out, np.array([0]))
    # first frame should be from ~2s in (index ~20 -> blue ~40)
    assert frames[0, :, :, 2].mean() > 25


def test_gif2mp4_roundtrip(tmp_path):
    """TGIF gif->mp4 flow: PIL-written gif through the native transcoder."""
    PIL = pytest.importorskip("PIL.Image")
    import numpy as np

    from tools.gif2mp4 import gif2mp4
    from xpretrain_tpu.data import video_reader

    frames = []
    for i in range(12):
        arr = np.zeros((48, 64, 3), np.uint8)
        arr[:, :, 0] = i * 20  # red encodes frame index
        frames.append(PIL.fromarray(arr))
    gif_path = str(tmp_path / "anim.gif")
    frames[0].save(
        gif_path, save_all=True, append_images=frames[1:], duration=100, loop=0
    )
    mp4_path = str(tmp_path / "anim.mp4")
    assert gif2mp4(gif_path, mp4_path, fps=10.0)

    info = video_reader.probe(mp4_path)
    assert info.num_frames >= 10
    out = video_reader.read_frames(mp4_path, np.array([0, info.num_frames - 1]))
    # red channel must grow from first to last frame (lossy encode tolerance)
    assert float(out[1, :, :, 0].mean()) > float(out[0, :, :, 0].mean()) + 50
