#!/usr/bin/env python3
"""Training CLI — reference-compatible interface.

``python3 train.py --dataroot <data> --outputroot <out> --run-name <name>``
(reference: train.py:262-786, README.md:8-12). Every config key is exposed
as a ``--<key>`` flag (underscores or dashes accepted); flags explicitly
passed override the JSON config, which overrides the built-in defaults —
the reference's argparse-SUPPRESS + dict.update merge semantics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Platform override hook: the axon TPU plugin ignores JAX_PLATFORMS, so an
# explicit escape hatch is needed to force CPU (e.g. smoke runs).
if os.environ.get("IEAGAN_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["IEAGAN_PLATFORM"])
# Persistent compilation cache: default ON (watchdog resumes and repeat
# campaigns would otherwise re-pay the ~8 min flagship compile on the
# tunneled chip every launch). IEAGAN_CACHE_DIR overrides the location;
# set it to "0" or "off" to disable.
_cache_dir = os.environ.get(
    "IEAGAN_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
if _cache_dir not in ("0", "off", ""):
    import jax
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ieagan_tpu.core.config import DEFAULT_CONFIG


def _flag_type(default):
    if isinstance(default, bool):
        return lambda s: s.lower() in ("1", "true", "yes", "y")
    if isinstance(default, int):
        return int
    if isinstance(default, float):
        return float
    return str


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="IEA-GAN/TPU trainer",
        argument_default=argparse.SUPPRESS)
    parser.add_argument("--config", type=str, default=argparse.SUPPRESS,
                        help="JSON config path (defaults merged under it)")
    parser.add_argument("--dataroot", type=str, default=argparse.SUPPRESS)
    parser.add_argument("--outputroot", type=str, default=argparse.SUPPRESS)
    parser.add_argument("--run-name", dest="run_name", type=str,
                        default=argparse.SUPPRESS)
    for key, val in DEFAULT_CONFIG.items():
        if key == "run_name":
            continue
        # Register both spellings: the reference's flags are underscore-style
        # (reference: train.py:279 "--num_workers"), dashes kept as aliases.
        flags = ["--" + key]
        if "_" in key:
            flags.append("--" + key.replace("_", "-"))
        kwargs = dict(dest=key, default=argparse.SUPPRESS)
        if val is None:
            kwargs["type"] = str
        else:
            kwargs["type"] = _flag_type(val)
        try:
            parser.add_argument(*flags, **kwargs)
        except argparse.ArgumentError:
            pass
    return parser


def main(argv=None):
    # Line-buffer stdout: the campaign watchdog detects chip-server wedges
    # by run-log mtime, so every progress line must land immediately even
    # when stdout is a file (block-buffered by default).
    try:
        sys.stdout.reconfigure(line_buffering=True)
    except (AttributeError, ValueError):
        pass
    args = vars(build_parser().parse_args(argv))
    config = dict(DEFAULT_CONFIG)
    config_path = args.pop("config", None)
    if config_path:
        with open(config_path, "r", encoding="utf-8") as fp:
            config.update(json.load(fp))
    elif os.path.exists("config.json"):
        # reference loads ./config.json from CWD (train.py:779-782)
        with open("config.json", "r", encoding="utf-8") as fp:
            config.update(json.load(fp))
    config.update(args)

    if "outputroot" not in config:
        parser_error = "the --outputroot flag is required"
        raise SystemExit(parser_error)

    # Multi-host bootstrap FIRST (idempotent; a plain single-process run is
    # a no-op): on a TPU pod every worker launches this same CLI and joins
    # via jax.distributed auto-detection — SURVEY.md §2.2's TPU-native plan.
    from ieagan_tpu.parallel.distributed import initialize
    initialize()

    import jax
    from ieagan_tpu.utils import initialize_directories
    from ieagan_tpu.train.driver import run
    if jax.process_index() == 0:
        initialize_directories(config)
    if jax.process_count() > 1:
        # run dirs must exist before worker processes write nothing into
        # them (they don't), but all processes must agree the run started
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("ieagan:run_dirs")
    return run(config)


if __name__ == "__main__":
    main()
