#!/usr/bin/env python3
"""Summarize a training run for VALIDATION.md: FID trajectory, step timing,
loss trends, SN singular-value envelope, EMA transition check.

Usage: python scripts/campaign_report.py /tmp/runs/flagship_r2
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ieagan_tpu.utils.log_read import (read_all_metric_logs, read_jsonl,
                                       sv_spectra)


def main():
    run_dir = sys.argv[1]
    logs = os.path.join(run_dir, "logs")
    out = {}

    # FID trajectory (metric_log.jsonl)
    mlog = os.path.join(logs, "metric_log.jsonl")
    if os.path.exists(mlog):
        mrows = list(read_jsonl(mlog))
        rows = [r for r in mrows if "FID" in r]
        out["fid"] = [(int(r["itr"]), round(float(r["FID"]), 3))
                      for r in rows]
        if rows:
            best = min(rows, key=lambda r: r["FID"])
            out["best_fid"] = {"itr": int(best["itr"]),
                               "FID": round(float(best["FID"]), 3)}
        # test_every companions (test_kid / test_physics_events): KID rides
        # the FID feature pass, physics adds occupancy + mean charge over N
        # generated events. Surfacing the trajectories here is what lets a
        # physics-divergent recipe be caught mid-campaign instead of by the
        # post-hoc proof suite (round-4 verdict item 9).
        # metric_log's KID/KID_floor are RAW kernel_distance values (the
        # driver logs fid_eval_once's "kid" untouched); only kid_eval.py's
        # proof artifact scales by 1e3.
        krows = [r for r in mrows if "KID" in r]
        if krows:
            out["kid_raw"] = [(int(r["itr"]), round(float(r["KID"]), 3))
                              for r in krows]
            floors = [float(r["KID_floor"]) for r in krows
                      if "KID_floor" in r]
            if floors:
                out["kid_floor_raw"] = round(floors[-1], 5)
        prows = [r for r in mrows if "phys_occupancy" in r]
        if prows:
            out["physics"] = [
                (int(r["itr"]), round(float(r["phys_occupancy"]), 6),
                 round(float(r["phys_mean_charge"]), 2)) for r in prows]

    metrics = read_all_metric_logs(logs)
    # step timing
    if "sec_per_itr" in metrics:
        it, v = metrics["sec_per_itr"]
        steady = v[len(v) // 4:]
        out["sec_per_itr"] = {"median": round(float(np.median(steady)), 4),
                              "p90": round(float(np.percentile(steady, 90)), 4),
                              "n_logged": int(len(v))}
    # loss trends: first/last decile means
    for k in ("G_loss", "D_loss_real", "D_loss_fake", "iea_loss"):
        if k in metrics:
            it, v = metrics[k]
            n = max(1, len(v) // 10)
            out.setdefault("losses", {})[k] = {
                "first": round(float(np.mean(v[:n])), 4),
                "last": round(float(np.mean(v[-n:])), 4)}
    # SN singular values bounded?
    for prefix in ("G", "D"):
        try:
            spec = sv_spectra(logs, prefix=prefix)
        except Exception:
            continue
        if not spec:
            continue
        # sv_spectra rows are stacked (itrs, vals)
        finals = {k: float(v[1][-1]) for k, v in spec.items() if v[1].size}
        maxes = {k: float(np.max(v[1])) for k, v in spec.items() if v[1].size}
        if finals:
            kmax = max(finals, key=finals.get)
            out.setdefault("sv", {})[prefix] = {
                "n_layers": len(finals),
                "final_max": round(finals[kmax], 3),
                "final_max_layer": kmax,
                "alltime_max": round(max(maxes.values()), 3)}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
