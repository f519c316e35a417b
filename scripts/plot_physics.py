#!/usr/bin/env python3
"""Paper-style physics figures from an eval-stats pickle (reference analog:
Evaluation/plot_for_paper.ipynb): pixel-intensity spectrum (lin + log),
occupancy distribution, per-sensor mean occupancy / mean charge, a 2x2
combined panel — with the real dataset filled gray underneath (reference
cells 6/9/12) and GAN/real ratio panels under each overlay.

Usage:
  python scripts/plot_physics.py <stats.pickle> [--out figures/]
where <stats.pickle> holds the dict produced by
ieagan_tpu.eval.physics.compare_models.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _density(hist, bins):
    widths = np.diff(bins)
    total = hist.sum() * widths
    return hist / np.maximum(total, 1e-12)


def _colors(all_stats):
    """Stable per-model colors across every panel (real = black)."""
    cyc = [f"C{i}" for i in range(10)]
    out, i = {}, 0
    for name in all_stats:
        if name == "real":
            out[name] = "black"
        else:
            out[name] = cyc[i % len(cyc)]
            i += 1
    return out


def _overlay(ax, all_stats, key_hist, key_bins, skip_first_bin=False):
    """Draw every model's histogram as density steps; real filled gray."""
    colors = _colors(all_stats)
    for name, st in all_stats.items():
        bins = np.asarray(st[key_bins])
        h = np.asarray(st[key_hist], float)
        if skip_first_bin:
            bins, h = bins[1:], h[1:]
        d = _density(h, bins)
        ax.stairs(d, bins, label=name, color=colors[name])
        if name == "real":
            ax.stairs(d, bins, fill=True, color="gray", alpha=0.2)


def _ratio(ax, all_stats, key_hist, key_bins, skip_first_bin=False):
    """GAN/real per-bin density ratio panel (only when 'real' present)."""
    real = all_stats.get("real")
    if real is None:
        ax.set_visible(False)
        return
    bins = np.asarray(real[key_bins])
    rh = np.asarray(real[key_hist], float)
    if skip_first_bin:
        bins, rh = bins[1:], rh[1:]
    rd = _density(rh, bins)
    colors = _colors(all_stats)
    for name, st in all_stats.items():
        if name == "real":
            continue
        h = np.asarray(st[key_hist], float)
        if skip_first_bin:
            h = h[1:]
        d = _density(h, bins)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where(rd > 0, d / rd, np.nan)
        ax.stairs(r, bins, label=name, color=colors[name])
    ax.axhline(1.0, color="black", lw=0.8, ls="--")
    ax.set_ylabel("model / real")
    ax.set_ylim(0, 2)


def _per_sensor_step(ax, all_stats, key, ylabel):
    n = None
    colors = _colors(all_stats)
    for name, st in all_stats.items():
        y = np.asarray(st[key], float)
        n = len(y)
        x = np.arange(n + 1)
        y_ext = np.append(y, y[-1])
        ax.step(x, y_ext, where="post", label=name, color=colors[name])
        if name == "real":
            ax.fill_between(x, y_ext, step="post", color="gray", alpha=0.2)
    if n == 40:  # PXD: sensors 0-15 inner layer, 16-39 outer (ref cell 12)
        ax.axvline(16, color="black", linestyle="--", lw=0.8)
    ax.set_xlabel("Sensor ID")
    ax.set_ylabel(ylabel)


def _save(fig, out_dir, name):
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, name), dpi=150)
    import matplotlib.pyplot as plt
    plt.close(fig)


def plot_all(all_stats: dict, out_dir: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    has_real = "real" in all_stats

    def overlay_with_ratio(key_hist, key_bins, xlabel, fname, log=False,
                           skip_first_bin=False):
        if has_real:
            fig, (ax, axr) = plt.subplots(
                2, 1, figsize=(7, 6), sharex=True,
                gridspec_kw={"height_ratios": [3, 1]})
        else:
            fig, ax = plt.subplots(figsize=(7, 5))
            axr = None
        _overlay(ax, all_stats, key_hist, key_bins, skip_first_bin)
        if log:
            ax.set_yscale("log")
        ax.set_ylabel("Density")
        ax.legend()
        if axr is not None:
            _ratio(axr, all_stats, key_hist, key_bins, skip_first_bin)
            axr.set_xlabel(xlabel)
        else:
            ax.set_xlabel(xlabel)
        _save(fig, out_dir, fname)

    # Pixel-intensity spectrum: linear (all bins) and log (above-noise bins,
    # reference pixel_intensity_{lin,log}.pdf)
    overlay_with_ratio("intensity_hist", "intensity_bins",
                       "Pixel Intensity [ADU]", "intensity_spectrum_lin.png")
    overlay_with_ratio("intensity_hist", "intensity_bins",
                       "Pixel Intensity [ADU]", "intensity_spectrum_log.png",
                       log=True, skip_first_bin=True)
    # Occupancy distribution (reference occupancy_distribution.pdf)
    overlay_with_ratio("occupancy_hist", "occupancy_bins",
                       "Occupancy", "occupancy.png")

    # Per-sensor mean occupancy (reference mean_occupancy.pdf)
    fig, ax = plt.subplots(figsize=(7, 4.5))
    _per_sensor_step(ax, all_stats, "per_sensor_occupancy", "Mean Occupancy")
    ax.legend()
    _save(fig, out_dir, "mean_occupancy.png")

    # Per-sensor mean charge (repo extension — the observable quoted in
    # docs/VALIDATION.md convergence tables)
    fig, ax = plt.subplots(figsize=(7, 4.5))
    _per_sensor_step(ax, all_stats, "per_sensor_mean_charge",
                     "Mean Charge [ADU]")
    ax.legend()
    _save(fig, out_dir, "mean_charge.png")

    # 2x2 combined panel (reference pixel_level_metrics.pdf)
    fig, axes = plt.subplots(2, 2, figsize=(9, 6.5))
    _overlay(axes[0, 0], all_stats, "intensity_hist", "intensity_bins")
    axes[0, 0].set_xlabel("Pixel Intensity [ADU]")
    axes[0, 0].set_ylabel("Density")
    _overlay(axes[0, 1], all_stats, "intensity_hist", "intensity_bins",
             skip_first_bin=True)
    axes[0, 1].set_yscale("log")
    axes[0, 1].set_xlabel("Pixel Intensity [ADU]")
    _overlay(axes[1, 0], all_stats, "occupancy_hist", "occupancy_bins")
    axes[1, 0].set_xlabel("Occupancy")
    axes[1, 0].set_ylabel("Density")
    _per_sensor_step(axes[1, 1], all_stats, "per_sensor_occupancy",
                     "Mean Occupancy")
    fig.legend(*axes[0, 0].get_legend_handles_labels(), loc="upper center",
               ncol=min(5, len(all_stats)), bbox_to_anchor=(0.5, 1.0))
    _save(fig, out_dir, "pixel_level_metrics.png")
    print(f"figures -> {out_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stats_pickle", type=str)
    ap.add_argument("--out", default="figures")
    args = ap.parse_args()
    with open(args.stats_pickle, "rb") as fp:
        all_stats = pickle.load(fp)
    plot_all(all_stats, args.out)


if __name__ == "__main__":
    main()
