"""Native libav video reader tests (synthetic videos written with cv2)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from xpretrain_tpu.data import video_reader  # noqa: E402


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    """Write a 60-frame video whose frames encode their index in color."""
    path = str(tmp_path_factory.mktemp("vids") / "clip.avi")
    w, h, n = 64, 48, 60
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (w, h))
    assert writer.isOpened(), "cv2 has no usable encoder in this image"
    for i in range(n):
        frame = np.full((h, w, 3), 0, np.uint8)
        frame[:, :, 0] = i * 4  # blue channel encodes frame index
        writer.write(frame)
    writer.release()
    return path, n, (h, w)


def test_probe(test_video):
    path, n, (h, w) = test_video
    info = video_reader.probe(path)
    assert info.num_frames == n
    assert (info.height, info.width) == (h, w)
    assert abs(info.fps - 10.0) < 0.1


def test_native_lib_is_built():
    assert video_reader.native_available(), "native/build/libxvr.so missing — run make -C native"


def test_read_frames_identity(test_video):
    path, n, (h, w) = test_video
    idx = np.array([0, 7, 23, 59, 23])
    frames = video_reader.read_frames(path, idx)
    assert frames.shape == (5, h, w, 3)
    # blue channel (RGB index 2) should encode ~i*4 (MJPG is lossy)
    for k, i in enumerate(idx):
        got = float(frames[k, :, :, 2].mean())
        assert abs(got - i * 4) < 10, f"frame {i}: expected ~{i*4} got {got}"


def test_read_frames_resized(test_video):
    path, n, _ = test_video
    frames = video_reader.read_frames(path, np.array([5, 10]), out_hw=(24, 32))
    assert frames.shape == (2, 24, 32, 3)


def test_unsorted_indices_restore_order(test_video):
    path, *_ = test_video
    idx = np.array([30, 2, 45])
    frames = video_reader.read_frames(path, idx)
    blues = frames[:, :, :, 2].mean(axis=(1, 2))
    assert abs(blues[0] - 120) < 10
    assert abs(blues[1] - 8) < 10
    assert abs(blues[2] - 180) < 10


def test_ingest_benchmark_pipeline():
    """The decode-pool ingest benchmark runs end-to-end on tiny inputs."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_ingest",
        os.path.join(os.path.dirname(__file__), "..", "tools", "bench_ingest.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    row = mod.run_benchmark(
        workers=2, clips=4, num_frm=4, crop=32, src_hw=(48, 64),
        src_frames=20, n_videos=2,
    )
    assert row["frames_per_s"] > 0 and row["decoded_MB_per_s"] > 0
    assert row["batch_shape"] == [4, 4, 32, 32, 3]


def test_h264_transcode_roundtrip(test_video, tmp_path):
    """H.264 encode (native transcoder → system libx264) + decode round
    trip: the HD-VILA-100M corpus codec (hd-vila-100m/README.md:15), which
    cv2's bundled ffmpeg cannot encode in this image — the system
    libavcodec the native lib links can."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.compress_videos import transcode

    path, n, (h, w) = test_video
    out = str(tmp_path / "clip_h264.mp4")
    assert transcode(path, out, fps=10.0, height=0, codec="libx264"), \
        "libx264 encode failed (system libavcodec missing x264?)"
    info = video_reader.probe(out)
    assert info.num_frames >= n - 2  # container may drop trailing frames
    frames = video_reader.read_frames(out, np.array([0, 5, 20]))
    assert frames.shape == (3, h, w, 3)
    # frame 20's blue channel encodes ~80 (lossy: wide tolerance)
    assert abs(int(frames[2, :, :, 2].mean()) - 80) < 25


def test_ingest_benchmark_h264_and_process_mode():
    """The ingest bench's H.264 row and worker-process mode both run."""
    import importlib.util
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "bench_ingest",
        os.path.join(os.path.dirname(__file__), "..", "tools", "bench_ingest.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    # register under the module name so ProcessPoolExecutor can pickle the
    # worker function by reference (tools/ is not a package on sys.path)
    sys.modules["bench_ingest"] = mod
    spec.loader.exec_module(mod)
    row = mod.run_benchmark(
        workers=2, clips=4, num_frm=4, crop=32, src_hw=(48, 64),
        src_frames=20, n_videos=2, codec="h264",
    )
    assert row["codec"] == "h264" and row["frames_per_s"] > 0
    row = mod.run_benchmark(
        workers=2, clips=4, num_frm=4, crop=32, src_hw=(48, 64),
        src_frames=20, n_videos=2, mode="process",
    )
    assert row["mode"] == "process" and row["frames_per_s"] > 0
