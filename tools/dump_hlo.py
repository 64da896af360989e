#!/usr/bin/env python
"""Dump the optimized HLO of the bench step and locate given op names
(e.g. convolution / big copies) with their source metadata.
Usage: python tools/dump_hlo.py [--worlds 64] [--grep convolution]
"""
from __future__ import annotations

import argparse
import os
import re
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worlds", type=int, default=1024)
    p.add_argument("--entities", type=int, default=10240)
    p.add_argument("--characters", type=int, default=64)
    p.add_argument("--bodies", type=int, default=64)
    p.add_argument("--particles", type=int, default=2048)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--config", default="full")
    p.add_argument("--trials", type=int, default=1)
    p.add_argument("--dt", type=float, default=1 / 60)
    p.add_argument("--grep", default="convolution")
    p.add_argument("--out", default="/tmp/bench_hlo.txt")
    args = p.parse_args()

    import bench

    run_steps, state_b = bench.build(args)
    lowered = run_steps.lower(state_b, jnp.float32(args.dt), args.steps)
    txt = lowered.compile().as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}", file=sys.stderr)
    pat = re.compile(args.grep)
    for line in txt.splitlines():
        if pat.search(line):
            print(line.strip()[:400])


if __name__ == "__main__":
    main()
