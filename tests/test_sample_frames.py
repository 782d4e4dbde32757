import numpy as np

from xpretrain_tpu.data.sample_frames import (
    FrameSampler,
    center_neighbor_sample,
    multi_clip_sample,
    uniform_sample_with_jitter,
)


def test_test_mode_deterministic_centered():
    s = FrameSampler(clip_len=4, frame_interval=2, num_clips=3, test_mode=True)
    a = s(100)
    b = s(100)
    assert np.array_equal(a, b)
    assert a.shape == (12,)
    assert a.min() >= 0 and a.max() < 100


def test_train_mode_within_bounds_and_seeded():
    s = FrameSampler(clip_len=8, frame_interval=1, num_clips=2)
    rng1, rng2 = np.random.default_rng(7), np.random.default_rng(7)
    a, b = s(50, rng1), s(50, rng2)
    assert np.array_equal(a, b)
    assert a.shape == (16,)
    assert a.min() >= 0 and a.max() < 50


def test_short_video_loops():
    s = FrameSampler(clip_len=12, frame_interval=1, num_clips=1, test_mode=True)
    inds = s(5)
    assert inds.shape == (12,)
    assert inds.max() < 5  # loop mode wraps


def test_repeat_last_clamps():
    s = FrameSampler(
        clip_len=6, frame_interval=4, num_clips=1, out_of_bound_opt="repeat_last", test_mode=True
    )
    inds = s(10)
    assert inds.max() < 10
    # overshooting indices clamp to the last valid one -> non-decreasing tail
    assert inds[-1] == inds[-2]


def test_twice_sample_doubles():
    s = FrameSampler(clip_len=4, num_clips=3, test_mode=True, twice_sample=True)
    assert s(100).shape == (24,)


def test_temporal_jitter_stays_bounded():
    s = FrameSampler(clip_len=4, frame_interval=3, num_clips=2, temporal_jitter=True)
    inds = s(100, np.random.default_rng(0))
    assert inds.min() >= 0 and inds.max() < 100


def test_uniform_jitter_test_mode_midpoints():
    inds = uniform_sample_with_jitter(120, 12, test_mode=True)
    assert inds.shape == (12,)
    assert np.all(np.diff(inds) > 0)
    assert inds[0] == 5  # midpoint of [0, 10)


def test_uniform_jitter_train_one_per_segment():
    rng = np.random.default_rng(0)
    inds = uniform_sample_with_jitter(120, 12, rng=rng)
    bounds = np.linspace(0, 120, 13)
    for i, idx in enumerate(inds):
        assert bounds[i] <= idx <= bounds[i + 1]


def test_uniform_jitter_short_video():
    inds = uniform_sample_with_jitter(3, 12, test_mode=True)
    assert inds.shape == (12,)
    assert inds.max() < 3


def test_center_neighbor():
    inds, mid = center_neighbor_sample(1000, 7, 12, test_mode=True)
    assert inds.shape == (7,)
    assert mid == 3
    assert np.all(np.diff(inds) == 12)


def test_center_neighbor_short():
    inds, _ = center_neighbor_sample(10, 7, 12, test_mode=True)
    assert inds.min() >= 0 and inds.max() < 10


def test_multi_clip_budget_split():
    out = multi_clip_sample([100, 80, 90, 50], 32, test_mode=True)
    assert len(out) == 4
    assert sum(len(o) for o in out) == 32
    for counts, o in zip([100, 80, 90, 50], out):
        assert o.max() < counts


def test_spread_center_neighbor_sample():
    from xpretrain_tpu.data.sample_frames import spread_center_neighbor_sample

    # eval: clips spread across the video, not duplicated at the center
    clips = spread_center_neighbor_sample(360, 4, 3, 12, test_mode=True)
    assert len(clips) == 4
    middles = [c[1] for c in clips]
    assert len(set(middles)) == 4, "eval clips must cover distinct positions"
    assert middles == sorted(middles)
    for c in clips:
        assert c[1] - c[0] == 12 and c[2] - c[1] == 12  # neighbor spacing
    # train: random distinct middles, in range
    rng = np.random.default_rng(0)
    tr = spread_center_neighbor_sample(360, 4, 3, 12, rng)
    assert len({c[1] for c in tr}) == 4
    assert all((c >= 0).all() and (c < 360).all() for c in tr)
    # short video: sample rate shrinks instead of crashing
    short = spread_center_neighbor_sample(10, 3, 3, 12, test_mode=True)
    assert all((c >= 0).all() and (c < 10).all() for c in short)
