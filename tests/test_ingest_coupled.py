"""Coupled ingest-fed training keeps the device step rate (verdict r3 #1).

Drives the REAL feed path — annotation rows -> ``VideoRetrievalDataset`` ->
sampler -> transform -> collator -> ``BatchLoader(num_workers)`` ->
``PrefetchLoader`` -> ``shard_host_batch`` -> SPMD train step — and asserts
the prefetched feed keeps the per-step time within ~15-20% of the
device-resident synthetic batch.

The corpus here is npy frame stores (``FrameSource`` mmap branch): this host
has ONE cpu core, so a codec decode would serialize with the CPU device step
no matter how good the overlap machinery is. Codec decode rates are measured
separately by ``tools/bench_e2e_ingest.py`` host rows (PERF.md "sustained
ingest"); this test pins the overlap machinery itself.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_clipvip_coupled_feed_keeps_step_rate(tmp_path):
    from tools.bench_e2e_ingest import PIPELINES, measure_coupled

    rng = np.random.default_rng(0)
    for i in range(4):
        np.save(
            tmp_path / f"vid{i}.npy",
            rng.integers(0, 255, size=(48, 128, 160, 3), dtype=np.uint8),
        )
    pipe = PIPELINES["clipvip"](str(tmp_path), tiny=True, n_videos=4)
    r = measure_coupled(pipe, workers=2, n_steps=12)
    assert np.isfinite(r["coupled_ms"]) and r["coupled_ms"] > 0
    # prefetch must hide the host pipeline behind the device step
    assert r["overhead_pct"] < 20, r
