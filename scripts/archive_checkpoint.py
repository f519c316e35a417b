#!/usr/bin/env python3
"""Archive a run's latest (or named) checkpoint tag into the git repo.

The machine hosting this repo is recycled between sessions: everything
outside git — including `_local/runs/*/weights` — is wiped (round-4
post-mortem, docs/ROADMAP.md). Chip-hours-expensive checkpoints must
therefore be committed. This copies one tag's six component files
(reference layout: G, G_optim, D, D_optim, G_ema, state_dict — see
ieagan_tpu/utils/checkpoint.py) into `artifacts/<run>/` with their
sha256s, ready for `git add`.

Usage: python scripts/archive_checkpoint.py <run_dir> [tag] [--no-optim]
       tag defaults to the newest copy<N>/best<N> by itr in state_dict.
       --no-optim skips G_optim/D_optim (~40% of the bytes; resume then
       uses load_optim=False and re-warms Adam moments).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _tags_by_itr(weights_dir: Path, prefix: str | None = None):
    out = []
    for p in weights_dir.glob("state_dict_*.json"):
        tag = p.stem[len("state_dict_"):]
        if prefix is not None and not tag.startswith(prefix):
            continue
        try:
            itr = json.loads(p.read_text()).get("itr", -1)
        except (ValueError, OSError):
            continue
        out.append((itr, tag))
    return out


def newest_tag(weights_dir: Path) -> str:
    tags = _tags_by_itr(weights_dir)
    if not tags:
        raise SystemExit(f"no state_dict_*.json under {weights_dir}")
    return max(tags)[1]


def best_tag(weights_dir: Path) -> str | None:
    """The most recent best<N> tag (the driver only rotates a best tag in
    when FID improves, so the newest-itr best tag IS the best-FID
    checkpoint — which the newest copy<N> tag stops being the moment a
    campaign passes its FID peak, as flagship_r4 did at itr 14000)."""
    tags = _tags_by_itr(weights_dir, prefix="best")
    return max(tags)[1] if tags else None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=Path)
    ap.add_argument("tag", nargs="?", default=None)
    ap.add_argument("--no-optim", action="store_true")
    args = ap.parse_args()

    weights = args.run_dir / "weights"
    tag = args.tag or newest_tag(weights)
    dest = REPO / "artifacts" / args.run_dir.name
    dest.mkdir(parents=True, exist_ok=True)

    bases = ["G", "D", "G_ema", "state_dict"]
    if not args.no_optim:
        bases[3:3] = ["G_optim", "D_optim"]
    # The manifest accumulates per-tag file listings so two tags (newest
    # copy<N> resume point + newest best<N> FID peak) can coexist in one
    # artifacts/<run>/ dir; stale tags are pruned by the caller.
    manifest = {"run": args.run_dir.name, "tags": {}}
    mpath = dest / "MANIFEST.json"
    if mpath.exists():
        try:
            prev = json.loads(mpath.read_text())
            if prev.get("run") == manifest["run"]:
                manifest["tags"] = dict(prev.get("tags", {}))
                if "tag" in prev and "files" in prev:  # legacy single-tag
                    manifest["tags"].setdefault(prev["tag"], prev["files"])
        except (ValueError, OSError):
            pass
    files = {}
    for base in bases:
        ext = "json" if base == "state_dict" else "msgpack"
        src = weights / f"{base}_{tag}.{ext}"
        if not src.exists():
            raise SystemExit(f"missing {src}")
        out = dest / src.name
        shutil.copy2(src, out)
        h = hashlib.sha256(out.read_bytes()).hexdigest()
        files[src.name] = {"sha256": h, "bytes": out.stat().st_size}
        print(f"{h}  {out.relative_to(REPO)}  {out.stat().st_size}")
    manifest["tags"][tag] = files
    # Drop manifest entries whose files are gone (pruned stale tags).
    manifest["tags"] = {
        t: fs for t, fs in manifest["tags"].items()
        if all((dest / name).exists() for name in fs)}
    mpath.write_text(json.dumps(manifest, indent=1))
    print(f"archived tag {tag} -> {dest.relative_to(REPO)} "
          f"(git add artifacts/ to persist)")


if __name__ == "__main__":
    main()
