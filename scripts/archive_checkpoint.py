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


def newest_tag(weights_dir: Path) -> str:
    best = None
    for p in weights_dir.glob("state_dict_*.json"):
        tag = p.stem[len("state_dict_"):]
        try:
            itr = json.loads(p.read_text()).get("itr", -1)
        except (ValueError, OSError):
            continue
        if best is None or itr > best[0]:
            best = (itr, tag)
    if best is None:
        raise SystemExit(f"no state_dict_*.json under {weights_dir}")
    return best[1]


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
    manifest = {"run": args.run_dir.name, "tag": tag, "files": {}}
    for base in bases:
        ext = "json" if base == "state_dict" else "msgpack"
        src = weights / f"{base}_{tag}.{ext}"
        if not src.exists():
            raise SystemExit(f"missing {src}")
        out = dest / src.name
        shutil.copy2(src, out)
        h = hashlib.sha256(out.read_bytes()).hexdigest()
        manifest["files"][src.name] = {"sha256": h,
                                       "bytes": out.stat().st_size}
        print(f"{h}  {out.relative_to(REPO)}  {out.stat().st_size}")
    (dest / "MANIFEST.json").write_text(json.dumps(manifest, indent=1))
    print(f"archived tag {tag} -> {dest.relative_to(REPO)} "
          f"(git add artifacts/ to persist)")


if __name__ == "__main__":
    main()
