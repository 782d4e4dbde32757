#!/usr/bin/env python
"""Measured on-device profiler counters for the PERF headline rows.

Round-3 verdict #2: every PERF MFU/HBM% claim divides XLA's *analytic*
cost-model numbers by wall time; this tool captures a real ``jax.profiler``
device trace of one benchmark iteration per family (via
``bench_report.TRACE_DIR``) and parses the xplane with the TensorFlow
profiler's op_profile conversion, giving

- **measured busy/idle device time** (per-op device_duration summed by the
  tool — real chip timestamps, not wall clock, so tunnel RTT and dispatch
  gaps fall out as IDLE);
- **measured MXU utilization** = HLO FLOPs / measured busy time / peak;
- **measured HBM bandwidth** = HLO HBM bytes / measured busy time (the
  xprof "Measured Memory BW" methodology: per-op byte counts are the HLO
  cost model's, the time base is measured — per-op attribution is what the
  whole-program analytic columns in PERF.md lack);
- the **top byte-moving ops** per step — the byte-budget audit naming which
  op classes move the HBM traffic (round-3 verdict #6).

Run on the real chip, never concurrently with other device work:
    python tools/profile_counters.py --benches clipvip_train hdvila_train \
        lfvila_train hdvila_train_s2 lfvila_train_s2 --out PERF_MEASURED.md
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools import bench_report  # noqa: E402

# memory-space order in op_profile's rawBytesAccessedArray / bandwidthUtils,
# verified against the plane's peak stats (hbm 819, vmem rd 18432, wr 6144
# GB/s): utils[i] == bytes[i] / time / peak[i]
MEM_HBM, MEM_VMEM_RD, MEM_VMEM_WR = 0, 1, 2

BENCHES = {
    "clipvip_serve": (bench_report.bench_clipvip, {}),
    "clipvip_train": (bench_report.bench_clipvip_train, {}),
    "hdvila_enc": (bench_report.bench_hdvila, {}),
    "lfvila_enc": (bench_report.bench_lfvila, {}),
    "hdvila_train": (bench_report.bench_hdvila_train, {}),
    # the PERF.md headline configs: full remat + fp32 (712 ms row); the
    # dots_saveable policy fits single-chip ONLY with bf16 moments (681 ms
    # row) — with fp32 moments it ResourceExhausts (PERF.md "Selective remat")
    "lfvila_train": (bench_report.bench_lfvila_train,
                     {"remat": True, "group_windows": False}),
    # r4-verdict #1 lever: fold attention layout (one combined
    # partition+head-split relayout; bit-identical outputs)
    "lfvila_train_fold": (bench_report.bench_lfvila_train,
                          {"remat": True, "attn_fold": True}),
    # r5 winner (+12.8% whole-step, now the production default):
    # lane-aligned grouped window attention
    "lfvila_train_grouped": (bench_report.bench_lfvila_train,
                             {"remat": True, "group_windows": True}),
    "lfvila_train_bf16m": (bench_report.bench_lfvila_train,
                           {"remat": True, "remat_policy": "dots_saveable",
                            "moment_dtype": "bfloat16"}),
    # the r3-verdict #6 lever: bf16 param storage + fp32 masters. A/B pairs:
    # full-remat bf16 moments with vs without bf16 params, and bf16 params
    # composed with the saved-dots policy (the freed param bytes may give the
    # policy the headroom it needs)
    "lfvila_train_bf16m_full": (bench_report.bench_lfvila_train,
                                {"remat": True, "moment_dtype": "bfloat16"}),
    "lfvila_train_bf16p": (bench_report.bench_lfvila_train,
                           {"remat": True, "moment_dtype": "bfloat16",
                            "param_dtype": "bfloat16"}),
    "lfvila_train_bf16pm_dots": (bench_report.bench_lfvila_train,
                                 {"remat": True, "remat_policy": "dots_saveable",
                                  "moment_dtype": "bfloat16",
                                  "param_dtype": "bfloat16"}),
    # r4-verdict #5 lever: space-to-depth stem (bit-equivalent re-blocked
    # conv1; raises stem MXU occupancy on 3-channel 640×1024 inputs)
    "hdvila_train_s2d": (bench_report.bench_hdvila_train, {"s2d_stem": True}),
    "hdvila_train_s2": (bench_report.bench_hdvila_train_stage2, {"batch": 8}),
    "hdvila_train_s2_b16": (bench_report.bench_hdvila_train_stage2, {}),
    # the r3-verdict #5 stand-in for the uncompilable b=16 recipe: 2 MultiSteps
    # microbatches of 8 per optimizer step (trajectory equivalence asserted in
    # tests/test_grad_accum_equivalence.py)
    "hdvila_train_s2_accum": (bench_report.bench_hdvila_train_stage2,
                              {"batch": 8, "grad_accum": 2}),
    "lfvila_train_s2": (bench_report.bench_lfvila_train_stage2, {}),
    # workaround probe for the 2026-08-19 compile-helper crash on the remat
    # variant: stage 2 stop-gradients the frozen encoders, so the no-remat
    # activation footprint may fit b=8 outright
    "lfvila_train_s2_noremat": (bench_report.bench_lfvila_train_stage2,
                                {"remat": False}),
}


def _metrics(node) -> dict:
    m = node.get("metrics", {})
    raw = m.get("rawBytesAccessedArray", [0, 0, 0]) or [0, 0, 0]
    return {
        "time_ps": float(m.get("rawTime", 0.0)),
        "flops": float(m.get("rawFlops", 0.0)),
        "hbm_bytes": float(raw[MEM_HBM]) if len(raw) > MEM_HBM else 0.0,
        "vmem_rd": float(raw[MEM_VMEM_RD]) if len(raw) > MEM_VMEM_RD else 0.0,
        "vmem_wr": float(raw[MEM_VMEM_WR]) if len(raw) > MEM_VMEM_WR else 0.0,
        "occurrences": int(m.get("occurrences", 0)),
    }


def parse_op_profile(trace_dir: str, top_n: int = 12) -> dict | None:
    """Parse a jax.profiler trace directory into measured aggregates."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        return None
    from tensorflow.python.profiler.internal import _pywrap_profiler_plugin as pp

    data, _ = pp.xspace_to_tools_data(paths, "op_profile", {})
    tree = json.loads(data if isinstance(data, str) else data.decode())
    root = tree.get("byCategory") or tree.get("byProgram")
    if root is None:
        return None
    total = _metrics(root)
    idle_ps = 0.0
    ops = []  # leaf-ish rows: one per dedup group under each category
    for cat in root.get("children", []):
        if cat.get("name") == "IDLE":
            idle_ps = _metrics(cat)["time_ps"]
            continue
        groups = cat.get("children") or [cat]
        for g in groups:
            m = _metrics(g)
            if m["time_ps"] <= 0:
                continue
            ops.append({"name": g.get("name", "?"), "category": cat.get("name", "?"), **m})
    busy_ps = max(total["time_ps"] - idle_ps, 1.0)
    busy_s = busy_ps / 1e12
    # aggregate by XLA op category — the byte-budget audit wants op *classes*
    # (window attention convs, gemms, copies, optimizer loop fusions), not a
    # top-N that covers a sliver of a long-tailed step
    cats: dict[str, dict] = {}
    for o in ops:
        c = cats.setdefault(o["category"], {"time_ps": 0.0, "hbm_bytes": 0.0, "flops": 0.0})
        c["time_ps"] += o["time_ps"]
        c["hbm_bytes"] += o["hbm_bytes"]
        c["flops"] += o["flops"]
    by_category = [
        {
            "category": k,
            "time_ms": round(c["time_ps"] / 1e9, 2),
            "time_pct_busy": round(100 * c["time_ps"] / busy_ps, 1),
            "hbm_GB": round(c["hbm_bytes"] / 1e9, 2),
            "hbm_pct_bytes": round(100 * c["hbm_bytes"] / max(total["hbm_bytes"], 1.0), 1),
            "hbm_gbps": round(c["hbm_bytes"] / max(c["time_ps"] / 1e12, 1e-12) / 1e9, 1),
            "mxu_pct": round(
                100 * c["flops"] / max(c["time_ps"] / 1e12, 1e-12) / bench_report.V5E_PEAK_BF16, 1
            ),
        }
        for k, c in sorted(cats.items(), key=lambda kv: -kv[1]["time_ps"])
    ]
    def _op_row(o):
        return {
            "name": o["name"][:70],
            "category": o["category"],
            "time_ms": round(o["time_ps"] / 1e9, 3),
            "time_pct_busy": round(100 * o["time_ps"] / busy_ps, 1),
            "hbm_MB": round(o["hbm_bytes"] / 1e6, 1),
            "hbm_gbps": round(o["hbm_bytes"] / max(o["time_ps"] / 1e12, 1e-12) / 1e9, 1),
            "mxu_pct": round(
                100 * o["flops"] / max(o["time_ps"] / 1e12, 1e-12) / bench_report.V5E_PEAK_BF16, 1
            ),
        }

    ops.sort(key=lambda o: o["hbm_bytes"], reverse=True)
    top = [_op_row(o) for o in ops[:top_n]]
    # the zero-MXU data-movement audit (r4 verdict #1): top ops BY TIME in the
    # pure-movement categories, named so they can be matched against the
    # optimized HLO dump and attributed to source (partition/reverse, head
    # split, remat recompute, optimizer update)
    movement = [o for o in ops if o["category"] in
                ("data formatting", "loop fusion", "copy-done", "copy", "output fusion")]
    movement.sort(key=lambda o: o["time_ps"], reverse=True)
    top_movement = [_op_row(o) for o in movement[:top_n]]
    by_time = sorted(ops, key=lambda o: o["time_ps"], reverse=True)
    top_time = [_op_row(o) for o in by_time[:top_n]]
    return {
        "busy_ms": round(busy_ps / 1e9, 2),
        "idle_ms": round(idle_ps / 1e9, 2),
        "measured_mxu_pct": round(
            100 * total["flops"] / busy_s / bench_report.V5E_PEAK_BF16, 1
        ),
        "measured_hbm_gbps": round(total["hbm_bytes"] / busy_s / 1e9, 1),
        "measured_hbm_pct": round(
            100 * total["hbm_bytes"] / busy_s / bench_report.V5E_HBM_BPS, 1
        ),
        "hbm_GB_total": round(total["hbm_bytes"] / 1e9, 2),
        "vmem_rd_gbps": round(total["vmem_rd"] / busy_s / 1e9, 0),
        "vmem_wr_gbps": round(total["vmem_wr"] / busy_s / 1e9, 0),
        "by_category": by_category,
        "top_hbm_ops": top,
        "top_movement_ops": top_movement,
        "top_time_ops": top_time,
    }


def run_bench_with_trace(name: str, quick: bool) -> dict:
    # a full-chip bench (LF-VILA uses ~all 16 GB) must not inherit the
    # previous bench's live executables/buffers: clear jit caches and
    # collect, or later benches in a multi-bench run ResourceExhaust
    import gc

    import jax

    gc.collect()
    jax.clear_caches()
    fn, kwargs = BENCHES[name]
    with tempfile.TemporaryDirectory() as td:
        bench_report.TRACE_DIR = td
        try:
            row = fn(quick, **kwargs) if "quick" in fn.__code__.co_varnames else fn(**kwargs)
        finally:
            bench_report.TRACE_DIR = ""
        traces = sorted(glob.glob(os.path.join(td, "trace*")))
        measured = parse_op_profile(traces[-1]) if traces else None
    out = {"bench": name, "analytic": row, "measured": measured}
    print(json.dumps(out), flush=True)
    return out


def write_markdown(results: list[dict], path: str) -> None:
    with open(path, "w") as f:
        f.write(
            "# Measured profiler counters vs analytic rooflines\n\n"
            "Per-op device times from a jax.profiler trace of one benchmark\n"
            "iteration (K scan-chained steps); rates are per busy-second, so\n"
            "tunnel RTT/dispatch gaps (IDLE) fall out. Byte counts per op are\n"
            "the HLO cost model's attributed to measured per-op time (the\n"
            "xprof Measured-Memory-BW methodology); true DRAM counters are\n"
            "not exposed by this profiler version.\n\n"
            "| bench | analytic MFU | measured MXU | analytic HBM | measured HBM "
            "| busy ms | idle ms |\n|---|---|---|---|---|---|---|\n"
        )
        for r in results:
            a, m = r["analytic"], r["measured"]
            if m is None:
                f.write(f"| {r['bench']} | {a.get('mfu_pct')}% | n/a | "
                        f"{a.get('hbm_pct')}% | n/a | | |\n")
                continue
            f.write(
                f"| {r['bench']} | {a.get('mfu_pct')}% | {m['measured_mxu_pct']}% "
                f"| {a.get('hbm_gbps', '—')} GB/s ({a.get('hbm_pct', '—')}%) "
                f"| {m['measured_hbm_gbps']} GB/s ({m['measured_hbm_pct']}%) "
                f"| {m['busy_ms']} | {m['idle_ms']} |\n"
            )
        for r in results:
            if not r["measured"] or not r["measured"].get("by_category"):
                continue
            f.write(f"\n## {r['bench']} — byte budget by op class (per traced call)\n\n")
            f.write("| op class | time ms | %busy | HBM GB | %bytes | HBM GB/s | MXU % |\n"
                    "|---|---|---|---|---|---|---|\n")
            for c in r["measured"]["by_category"]:
                f.write(f"| {c['category']} | {c['time_ms']} | {c['time_pct_busy']} "
                        f"| {c['hbm_GB']} | {c['hbm_pct_bytes']} | {c['hbm_gbps']} "
                        f"| {c['mxu_pct']} |\n")
        for r in results:
            if not r["measured"] or not r["measured"].get("top_time_ops"):
                continue
            f.write(f"\n## {r['bench']} — top ops by device time\n\n")
            f.write("| op | category | time ms | %busy | HBM MB | HBM GB/s | MXU % |\n"
                    "|---|---|---|---|---|---|---|\n")
            for o in r["measured"]["top_time_ops"]:
                f.write(f"| `{o['name']}` | {o['category']} | {o['time_ms']} "
                        f"| {o['time_pct_busy']} | {o['hbm_MB']} | {o['hbm_gbps']} "
                        f"| {o['mxu_pct']} |\n")
        for r in results:
            if not r["measured"] or not r["measured"].get("top_movement_ops"):
                continue
            f.write(f"\n## {r['bench']} — top zero-MXU data-movement ops by time\n\n")
            f.write("| op | category | time ms | %busy | HBM MB | HBM GB/s | MXU % |\n"
                    "|---|---|---|---|---|---|---|\n")
            for o in r["measured"]["top_movement_ops"]:
                f.write(f"| `{o['name']}` | {o['category']} | {o['time_ms']} "
                        f"| {o['time_pct_busy']} | {o['hbm_MB']} | {o['hbm_gbps']} "
                        f"| {o['mxu_pct']} |\n")
        for r in results:
            if not r["measured"]:
                continue
            f.write(f"\n## {r['bench']} — top HBM byte movers (per traced call)\n\n")
            f.write("| op | category | time ms | %busy | HBM MB | HBM GB/s | MXU % |\n"
                    "|---|---|---|---|---|---|---|\n")
            for o in r["measured"]["top_hbm_ops"]:
                f.write(f"| `{o['name']}` | {o['category']} | {o['time_ms']} "
                        f"| {o['time_pct_busy']} | {o['hbm_MB']} | {o['hbm_gbps']} "
                        f"| {o['mxu_pct']} |\n")


def main():
    bench_report.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--benches", nargs="+", default=["clipvip_train"],
                    choices=sorted(BENCHES), metavar="BENCH")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="PERF_MEASURED.md")
    ap.add_argument("--json_out", default="")
    args = ap.parse_args()
    results = []
    for n in args.benches:
        try:
            results.append(run_bench_with_trace(n, args.quick))
        except Exception as e:  # noqa: BLE001 - one OOM must not kill the campaign
            print(json.dumps({"bench": n, "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
    results = [r for r in results if "analytic" in r]
    write_markdown(results, args.out)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
