#!/usr/bin/env python3
"""Tracking-quality extraction with GAN vs GEANT4 background (reference
analog: Physics_Analysis/track_3.py): run reconstruction over events and
pickle per-track helix parameters, hit counts, and fit quality:
  d0, phi0, z0, omega, tan(lambda) (+ MC-truth versions), PXD/SVD/CDC hit
  counts, pValue, pt. Requires basf2."""

from __future__ import annotations

import argparse
import os
import pickle
import secrets

TRACK_KEYS = (
    "id_event", "id_track",
    "d0", "d0_t", "phi0", "phi0_t", "z0", "z0_t", "omega", "omega_t",
    "tlmd", "tlmd_t", "PXDHits", "SVDHits", "CDCHits", "pValue", "pt",
)


def run(output_file: str, input_file: str, max_event: int = 0,
        seed: int | None = None):
    import basf2  # Belle II only
    import reconstruction
    from ROOT import Belle2
    from tracking.validation.utilities import getHelixFromMCParticle

    def safe(getter):
        try:
            return getter()
        except ReferenceError:
            return None

    class TrackHarvester(basf2.Module):
        def __init__(self, save_path):
            super().__init__()
            self.save_path = save_path
            self.id_event = 0
            self.rows = []

        def event(self):
            tracks = Belle2.PyStoreArray("Tracks")
            for id_track, track in enumerate(tracks):
                row = {k: None for k in TRACK_KEYS}
                row["id_event"] = self.id_event
                row["id_track"] = id_track
                reco = track.getRelated("RecoTracks")
                fit = track.getTrackFitResult(Belle2.Const.pion)
                if isinstance(fit, Belle2.TrackFitResult):
                    row["d0"] = safe(fit.getD0)
                    row["phi0"] = safe(fit.getPhi0)
                    row["z0"] = safe(fit.getZ0)
                    row["omega"] = safe(fit.getOmega)
                    row["tlmd"] = safe(fit.getTanLambda)
                    row["pt"] = safe(fit.getTransverseMomentum)
                    row["pValue"] = safe(fit.getPValue)
                if reco:
                    row["PXDHits"] = reco.getNumberOfPXDHits()
                    row["SVDHits"] = reco.getNumberOfSVDHits()
                    row["CDCHits"] = reco.getNumberOfCDCHits()
                    mc = reco.getRelated("MCParticles")
                    if mc:
                        helix = getHelixFromMCParticle(mc)
                        row["d0_t"] = helix.getD0()
                        row["phi0_t"] = helix.getPhi0()
                        row["z0_t"] = helix.getZ0()
                        row["omega_t"] = helix.getOmega()
                        row["tlmd_t"] = helix.getTanLambda()
                self.rows.append(row)
            self.id_event += 1

        def terminate(self):
            with open(self.save_path, "wb") as fp:
                pickle.dump(self.rows, fp)

    basf2.set_random_seed(seed if seed is not None
                          else secrets.randbelow(2 ** 32 - 1))
    path = basf2.create_path()
    path.add_module("RootInput", inputFileName=input_file)
    path.add_module("Gearbox")
    path.add_module("Geometry")
    reconstruction.add_reconstruction(path)
    path.add_module(TrackHarvester(output_file))
    path.add_module("Progress")
    basf2.process(path, max_event)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output", type=str)
    ap.add_argument("input_files", nargs="+", type=str)
    ap.add_argument("--max-event", default=0, type=int)
    args = ap.parse_args()
    os.makedirs(args.output, exist_ok=True)
    for i, input_file in enumerate(args.input_files):
        run(os.path.join(args.output, f"tracks_{i:03d}.pickle"),
            input_file, args.max_event)


if __name__ == "__main__":
    main()
