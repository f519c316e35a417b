#!/usr/bin/env python3
"""GEANT4 event generation via basf2 (reference analog:
Physics_Analysis/evtgen_2.py): EvtGen Y(4S) events + full simulation with
optional background overlay, fanned out over --num-jobs subprocesses.

Requires a basf2 environment; this is the detector-simulation side of the
GAN-vs-GEANT4 comparison and only runs on Belle II infrastructure.
"""

from __future__ import annotations

import argparse
import os
import secrets
import subprocess
import sys


def run(output_file: str, num_events: int, *bkg_files: str, seed: int | None = None):
    import basf2  # noqa: E402  (Belle II only)
    import beamparameters
    import simulation

    basf2.set_random_seed(seed if seed is not None
                          else secrets.randbelow(2 ** 32 - 1))
    path = basf2.create_path()
    path.add_module("EventInfoSetter", evtNumList=[num_events])
    path.add_module("EventInfoPrinter")
    beamparameters.add_beamparameters(path, "Y4S")
    path.add_module("Progress")
    path.add_module("EvtGenInput")
    simulation.add_simulation(path, bkgfiles=list(bkg_files) or None)
    path.add_module("RootOutput", outputFileName=output_file,
                    updateFileCatalog=False)
    basf2.process(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("num_events", type=int)
    ap.add_argument("output", type=str)
    ap.add_argument("input_files", nargs="*", type=str)
    ap.add_argument("--num-jobs", default=1, type=int)
    ap.add_argument("--seed", default=None, type=int)
    args = ap.parse_args()
    if args.num_jobs > 1:
        os.makedirs(args.output, exist_ok=True)
        procs = [
            subprocess.Popen([
                sys.executable, os.path.abspath(__file__),
                str(args.num_events),
                os.path.join(args.output, f"events_{j:03d}.root"),
                *args.input_files])
            for j in range(args.num_jobs)]
        sys.exit(max(p.wait() for p in procs))
    run(args.output, args.num_events, *args.input_files, seed=args.seed)


if __name__ == "__main__":
    main()
