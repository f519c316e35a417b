#!/usr/bin/env python3
"""Decide whether a finished campaign leg should extend its step budget.

Round-4 post-mortem: the flagship stopped on a fixed 20k budget while a
prior trajectory was still improving at its budget's end (and a later leg
kept burning steps long after its FID peak). The driver stops at
--stop_after; this script reads the run's FID trajectory
(logs/metric_log.jsonl, written every test_every itrs) and prints either
a new, larger budget (FID still falling: the minimum sits in the last
`--window` evals) or "stop" (the optimum is behind us — further
constant-lr steps diverge, round-4 observed 119 -> 1675).

Usage: extend_decision.py <run_dir> <current_budget>
           [--window 2] [--chunk 3000] [--cap 40000]
Prints the new budget (int) or "stop" on stdout; everything else on
stderr so callers can capture stdout alone.
"""

from __future__ import annotations

import argparse
import json
import sys


def decide(fids, current, window=2, chunk=3000, cap=40000):
    """fids: [(itr, fid)] sorted by itr. Returns int budget or 'stop'."""
    if current >= cap:
        return "stop"
    if len(fids) < 3:
        # too few evals to call a trend; extend conservatively
        return min(current + chunk, cap)
    best_idx = min(range(len(fids)), key=lambda i: fids[i][1])
    if best_idx >= len(fids) - window:
        return min(current + chunk, cap)
    return "stop"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("current_budget", type=int)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=3000)
    ap.add_argument("--cap", type=int, default=40000)
    args = ap.parse_args()

    fids = []
    try:
        with open(f"{args.run_dir}/logs/metric_log.jsonl") as fp:
            for line in fp:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if "FID" in rec and "itr" in rec:
                    fids.append((int(rec["itr"]), float(rec["FID"])))
    except OSError as e:
        print(f"no metric log ({e}); stopping", file=sys.stderr)
        print("stop")
        return
    fids.sort()
    out = decide(fids, args.current_budget, args.window, args.chunk,
                 args.cap)
    tail = ", ".join(f"{i}:{f:.1f}" for i, f in fids[-4:])
    print(f"trajectory tail [{tail}] -> {out}", file=sys.stderr)
    print(out)


if __name__ == "__main__":
    main()
