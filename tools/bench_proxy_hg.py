#!/usr/bin/env python
"""Head-group (HG) sweep for the Pallas proxy-attention kernel (r4 verdict #4).

The kernel's grid is (B, H/HG): each cell loads [HG, S, D] q/k/v blocks into
VMEM and runs the per-frame + proxy-row attention there. HG is normally
chosen by the VMEM stack model (``_head_group``); this sweep forces each
divisor of H via ``XPT_PROXY_HG`` and measures fwd+bwd at the shipping B/32
TRAIN shape (B=32, H=12, S=4+12·49=592, D=64) — smaller groups mean more
grid cells (better pipelining overlap?) at the same total VMEM traffic;
larger groups amortize the proxy-row block. The winner (or a flat verdict)
goes to PERF.md.

Run on the real chip, one process per HG value (the env is read at trace
time and baked into the compiled kernel):
    for hg in 1 2 3 4 6 12; do XPT_PROXY_HG=$hg python tools/bench_proxy_hg.py; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xpretrain_tpu.ops.proxy_attention import proxy_flash_attention  # noqa: E402

B, H, D = 32, 12, 64
M, N, L = 4, 12, 49
S = M + N * L
K = 20


def main() -> None:
    from tools.bench_report import enable_compile_cache

    enable_compile_cache()
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)

    def loss(q, k, v):
        return proxy_flash_attention(q, k, v, M, N, L, D**-0.5).astype(jnp.float32).sum()

    @jax.jit
    def run_k(q, k, v):
        def step(c, _):
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                q + c.astype(q.dtype) * 1e-9, k, v
            )
            return l * 1e-9, None

        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=K)
        return c

    try:
        float(run_k(q, k, v))
    except Exception as e:  # infeasible HG: report the compile failure
        print(json.dumps({
            "hg": os.environ.get("XPT_PROXY_HG", "auto"),
            "error": f"{type(e).__name__}: {str(e)[:160]}",
        }))
        return
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run_k(q, k, v))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[2] / K
    print(json.dumps({
        "hg": os.environ.get("XPT_PROXY_HG", "auto"),
        "shape": [B, H, S, D],
        "fwd_bwd_ms": round(t * 1000, 3),
    }))


if __name__ == "__main__":
    main()
