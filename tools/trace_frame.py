#!/usr/bin/env python
"""Device-trace the full-frame bench step and print the top kernels by total
device time (reads the perfetto trace.json.gz jax.profiler writes).
Usage: python tools/trace_frame.py [--worlds 1024] [--steps 30]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worlds", type=int, default=1024)
    p.add_argument("--entities", type=int, default=10240)
    p.add_argument("--characters", type=int, default=64)
    p.add_argument("--bodies", type=int, default=64)
    p.add_argument("--particles", type=int, default=2048)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--config", default="full")
    p.add_argument("--trials", type=int, default=1)
    p.add_argument("--dt", type=float, default=1 / 60)
    p.add_argument("--out", default="/tmp/jtrace_frame")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    import bench

    run_steps, state_b = bench.build(args)
    dt = jnp.float32(args.dt)
    state_b, probe = run_steps(state_b, dt, args.steps)   # compile + warm
    _ = float(probe)

    shutil.rmtree(args.out, ignore_errors=True)
    with jax.profiler.trace(args.out):
        state_b, probe = run_steps(state_b, dt, args.steps)
        _ = float(probe)

    files = glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace file found under", args.out)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    # device-side complete events: pid whose process name mentions TPU/device
    pids = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {pid for pid, name in pids.items()
                if "TPU" in name or "/device" in name.lower() or "XLA" in name}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))  # µs
        tot[name] += dur
        cnt[name] += 1
        total += dur
    print(f"device total: {total/1e3:.1f} ms over {sum(cnt.values())} events "
          f"(pids={sorted(dev_pids)})")
    for name, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{dur/1e3:9.2f} ms  {cnt[name]:5d}x  {name[:110]}")


if __name__ == "__main__":
    main()
