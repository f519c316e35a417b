#!/usr/bin/env python3
"""Train-step profiling harness: bench_train with config overrides and an
optional jax.profiler trace.

The round-1 breakdown (ROADMAP.md) was one trace at one config; this makes
the experiment matrix cheap:

  python scripts/profile_step.py --epb 2 --trace-dir /tmp/trace_epb2
  python scripts/profile_step.py --set use_pallas_attention=false
  python scripts/profile_step.py --set split_D=false --epb 2

Prints one JSON line per run: {"ms_per_step":..., "mfu":..., "overrides":...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_val(s: str):
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epb", type=int, default=1)
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--precision", default=None,
                    choices=[None, "default", "high", "highest"])
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VAL", help="config override (repeatable)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    os.environ["BENCH_TRAIN_STEPS"] = str(args.steps)
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.precision:
        jax.config.update("jax_default_matmul_precision", args.precision)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    import bench
    from ieagan_tpu.core.config import DEFAULT_CONFIG

    overrides = {"events_per_batch": args.epb}
    for kv in args.set:
        k, _, v = kv.partition("=")
        overrides[k] = parse_val(v)
    config = dict(DEFAULT_CONFIG, **overrides)

    if args.trace_dir:
        # bench_train traces ONLY its steady-state timed loop (tracing
        # init/compile bloats the xplane and slows tunneled init ~3x);
        # parse the result with scripts/trace_analysis.py
        os.environ["BENCH_TRACE_STEADY"] = args.trace_dir
    out = bench.bench_train(config)
    if args.trace_dir:
        out["trace_dir"] = args.trace_dir
    out["overrides"] = overrides
    print(json.dumps(out))


if __name__ == "__main__":
    main()
