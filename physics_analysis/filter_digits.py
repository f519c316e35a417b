#!/usr/bin/env python3
"""Extract PXDDigits branches from background-overlay files (reference
analog: Physics_Analysis/filter_1s.py). Requires basf2."""

from __future__ import annotations

import argparse
import os


def run(output_file: str, input_file: str, max_event: int = 0):
    import basf2  # Belle II only
    path = basf2.create_path()
    path.add_module("RootInput", inputFileName=input_file,
                    branchNames=["PXDDigits"])
    path.add_module("Progress")
    path.add_module("RootOutput", outputFileName=output_file,
                    updateFileCatalog=False)
    basf2.process(path, max_event)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output", type=str)
    ap.add_argument("input_files", nargs="+", type=str)
    ap.add_argument("--max-event", default=0, type=int)
    args = ap.parse_args()
    os.makedirs(args.output, exist_ok=True)
    for i, input_file in enumerate(args.input_files):
        run(os.path.join(args.output, f"digits_{i:03d}.root"),
            input_file, args.max_event)


if __name__ == "__main__":
    main()
