#!/usr/bin/env python3
"""Archive a run's checkpoint tags into the git repo.

The machine hosting this repo is recycled between sessions: everything
outside git — including `_local/runs/*/weights` — is wiped (round-4
post-mortem, docs/ROADMAP.md). Chip-hours-expensive checkpoints must
therefore be committed. This copies a tag's component files (reference
layout: G, G_optim, D, D_optim, G_ema, state_dict — see
ieagan_tpu/utils/checkpoint.py) into `artifacts/<run>/` with their
sha256s, ready for `git add`.

Retention policy (round-5 verdict item 5): best<N> tags archive only
G_ema + state_dict (~47MB — the actual deliverable); copy<N> resume
sets archive in full (~235MB) but only every --copy-every iterations,
so a 20k campaign adds <300MB of pack per leg instead of ~5GB.

Usage:
  archive_checkpoint.py <run_dir> [tag] [--no-optim|--ema-only]
      one-shot archive of a tag (default: newest copy/best by itr)
  archive_checkpoint.py <run_dir> --auto [--copy-every N]
      one full cycle: resolve newest copy + best-FID tags, archive what
      changed (best: ema-only; copy: full, cadence-gated), then prune
      stale files. Prints "changed" on its last line iff the artifacts
      dir was modified (auto_archive.sh keys its git commit off this).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FULL_BASES = ["G", "D", "G_optim", "D_optim", "G_ema", "state_dict"]
EMA_BASES = ["G_ema", "state_dict"]


def _read_sd(p: Path) -> dict | None:
    try:
        return json.loads(p.read_text())
    except (ValueError, OSError):
        return None


def _tags_by_itr(weights_dir: Path, prefix: str | None = None):
    out = []
    for p in weights_dir.glob("state_dict_*.json"):
        tag = p.stem[len("state_dict_"):]
        if prefix is not None and not tag.startswith(prefix):
            continue
        sd = _read_sd(p)
        if sd is None:
            continue
        out.append((sd.get("itr", -1), tag))
    return out


def newest_tag(weights_dir: Path) -> str:
    tags = _tags_by_itr(weights_dir)
    if not tags:
        raise SystemExit(f"no state_dict_*.json under {weights_dir}")
    return max(tags)[1]


def best_tag(weights_dir: Path) -> str | None:
    """The best<N> tag with the LOWEST recorded best_FID.

    Not the newest-itr one: across resume legs the driver's best_FID
    threshold can reset (a resume seeded from a copy<N> state_dict), so
    a *newer* best tag can hold a *worse* checkpoint than an older one
    (round-4 advisor finding). min-FID is robust to that; ties break to
    the higher itr (later checkpoint at equal FID).
    """
    cands = []
    for p in weights_dir.glob("state_dict_best*.json"):
        sd = _read_sd(p)
        if sd is None or "best_FID" not in sd:
            continue
        cands.append((float(sd["best_FID"]), -int(sd.get("itr", -1)),
                      p.stem[len("state_dict_"):]))
    return min(cands)[2] if cands else None


def _bases_ext(base: str) -> str:
    return "json" if base == "state_dict" else "msgpack"


def _load_manifest(dest: Path, run: str) -> dict:
    manifest = {"run": run, "tags": {}}
    mpath = dest / "MANIFEST.json"
    if mpath.exists():
        prev = _read_sd(mpath)
        if prev and prev.get("run") == run:
            manifest["tags"] = dict(prev.get("tags", {}))
            if "tag" in prev and "files" in prev:  # legacy single-tag
                manifest["tags"].setdefault(prev["tag"], prev["files"])
    return manifest


def _write_manifest(dest: Path, manifest: dict) -> None:
    # Drop entries whose files are gone (pruned stale tags).
    manifest["tags"] = {
        t: fs for t, fs in manifest["tags"].items()
        if all((dest / name).exists() for name in fs)}
    (dest / "MANIFEST.json").write_text(json.dumps(manifest, indent=1))


def archive_tag(run_dir: Path, tag: str, bases: list[str]) -> None:
    """Copy one tag's files into artifacts/<run>/ and update MANIFEST.

    Archives into the manifest BEFORE any pruning happens (round-4
    advisor: the old prune-then-archive order could delete the committed
    checkpoint and then fail the archive, recording a deletion with no
    replacement).
    """
    weights = run_dir / "weights"
    dest = REPO / "artifacts" / run_dir.name
    dest.mkdir(parents=True, exist_ok=True)
    manifest = _load_manifest(dest, run_dir.name)
    files = {}
    for base in bases:
        src = weights / f"{base}_{tag}.{_bases_ext(base)}"
        if not src.exists():
            raise SystemExit(f"missing {src}")
        out = dest / src.name
        shutil.copy2(src, out)
        h = hashlib.sha256(out.read_bytes()).hexdigest()
        files[src.name] = {"sha256": h, "bytes": out.stat().st_size}
        print(f"{h}  {out.relative_to(REPO)}  {out.stat().st_size}")
    manifest["tags"][tag] = files
    _write_manifest(dest, manifest)
    print(f"archived tag {tag} -> {dest.relative_to(REPO)}")


def prune_to(run_dir: Path, keep: set[str]) -> list[str]:
    """Delete artifact checkpoint files not belonging to `keep` tags."""
    dest = REPO / "artifacts" / run_dir.name
    if not dest.is_dir():
        return []
    manifest = _load_manifest(dest, run_dir.name)
    keep_files = {name for t in keep
                  for name in manifest["tags"].get(t, {})}
    removed = []
    for p in dest.iterdir():
        if p.name == "MANIFEST.json" or not p.is_file():
            continue
        if p.name not in keep_files:
            p.unlink()
            removed.append(p.name)
    manifest["tags"] = {t: fs for t, fs in manifest["tags"].items()
                        if t in keep}
    _write_manifest(dest, manifest)
    return removed


def _snapshot(weights: Path) -> dict:
    """Tag -> state_dict sha for stability comparison (the driver writes
    a tag's six files non-atomically; state_dict is written last, so an
    unchanged state_dict 20s apart means the tag is settled)."""
    out = {}
    for p in weights.glob("state_dict_*.json"):
        try:
            out[p.stem] = hashlib.sha256(p.read_bytes()).hexdigest()
        except OSError:
            pass
    return out


def auto_cycle(run_dir: Path, copy_every: int, settle_s: float = 20.0) -> bool:
    """One archive cycle. Returns True iff artifacts changed."""
    weights = run_dir / "weights"
    snap = _snapshot(weights)
    if not snap:
        return False
    time.sleep(settle_s)
    if _snapshot(weights) != snap:
        print("tags unstable (driver mid-write), skipping cycle")
        return False

    copies = _tags_by_itr(weights, prefix="copy")
    cur_copy = max(copies) if copies else None  # (itr, tag)
    cur_best = best_tag(weights)

    dest = REPO / "artifacts" / run_dir.name
    manifest = _load_manifest(dest, run_dir.name) if dest.is_dir() else {
        "run": run_dir.name, "tags": {}}

    def archived_sha(tag: str) -> str | None:
        ent = manifest["tags"].get(tag, {}).get(f"state_dict_{tag}.json")
        return ent["sha256"] if ent else None

    changed = False
    kept: set[str] = set()

    # Best tag: archive whenever its state_dict differs from the manifest.
    if cur_best is not None:
        if archived_sha(cur_best) != snap.get(f"state_dict_{cur_best}"):
            archive_tag(run_dir, cur_best, EMA_BASES)
            changed = True
        kept.add(cur_best)
    else:
        # No best yet — keep whatever best tag the manifest already holds.
        kept.update(t for t in manifest["tags"] if t.startswith("best"))

    # Copy tag: full archive, gated to every `copy_every` iterations.
    if cur_copy is not None:
        itr, tag = cur_copy
        arch_copy_itrs = []
        for t, fs in manifest["tags"].items():
            if not t.startswith("copy"):
                continue
            sd = _read_sd(dest / f"state_dict_{t}.json")
            if sd is not None:
                arch_copy_itrs.append((sd.get("itr", -1), t))
        last = max(arch_copy_itrs) if arch_copy_itrs else None
        if last is None or itr >= last[0] + copy_every:
            archive_tag(run_dir, tag, FULL_BASES)
            changed = True
            kept.add(tag)
        elif last is not None:
            kept.add(last[1])

    if changed:
        removed = prune_to(run_dir, kept)
        if removed:
            print(f"pruned {len(removed)} stale files: {sorted(removed)}")
        print("changed")
    return changed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=Path)
    ap.add_argument("tag", nargs="?", default=None)
    ap.add_argument("--no-optim", action="store_true")
    ap.add_argument("--ema-only", action="store_true")
    ap.add_argument("--auto", action="store_true")
    ap.add_argument("--copy-every", type=int, default=2000)
    ap.add_argument("--settle", type=float, default=20.0)
    args = ap.parse_args()

    if args.auto:
        auto_cycle(args.run_dir, args.copy_every, args.settle)
        return

    tag = args.tag or newest_tag(args.run_dir / "weights")
    if args.ema_only:
        bases = EMA_BASES
    elif args.no_optim:
        bases = [b for b in FULL_BASES if not b.endswith("_optim")]
    else:
        bases = FULL_BASES
    archive_tag(args.run_dir, tag, bases)


if __name__ == "__main__":
    main()
