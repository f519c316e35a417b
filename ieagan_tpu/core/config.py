"""Configuration surface.

Preserves the reference's full 129-key config surface (reference:
``config.json:1-131`` merged with CLI flags in ``train.py:262-786``) plus a
small number of TPU-native extensions, all defaulted so that a reference
config.json loads unchanged.

Merge semantics mirror the reference (``train.py:779-786``): JSON file first,
then explicit CLI overrides on top.
"""

from __future__ import annotations

import copy
import json
from typing import Any, Mapping

# The reference defaults (reference: config.json:1-131). Keys and values are
# the public config API of the framework and must stay in sync with the
# reference so a user can switch with their existing config files.
DEFAULT_CONFIG: dict[str, Any] = {
    "num_workers": 8,
    "seed": 3651,
    "pin_memory": False,
    "shuffle": True,
    "augment": 0,
    "use_multiepoch_sampler": False,
    "debug": False,
    "model": "IEAGAN",
    "G_ch": 32,
    "G_param": "SN",
    "D_param": "SN",
    "D_ch": 32,
    "G_depth": 2,
    "D_depth": 2,
    "H_base": 3,
    "D_wide": True,
    "G_shared": True,
    "shared_dim": 128,
    "dim_z": 128,
    "z_var": 1.0,
    "hier": True,
    "cross_replica": False,
    "mybn": False,
    "G_activation": "inplace_relu",
    "D_activation": "inplace_relu",
    "G_attn": "0",
    "D_attn": "32",
    "norm_style": "bn",
    "G_init": "ortho",
    "D_init": "ortho",
    "skip_init": False,
    "G_lr": 5e-05,
    "D_lr": 5e-05,
    "G_B1": 0.0,
    "D_B1": 0.0,
    "G_B2": 0.999,
    "D_B2": 0.999,
    "batch_size": 40,
    "G_batch_size": 0,
    "num_G_accumulations": 1,
    "num_D_steps": 1,
    "num_D_accumulations": 1,
    "split_D": True,
    "num_epochs": 4,
    "parallel": False,
    "G_fp16": False,
    "D_fp16": False,
    "D_mixed_precision": False,
    "G_mixed_precision": False,
    "accumulate_stats": False,
    "num_standing_accumulations": 16,
    "G_eval_mode": True,
    "save_every": 1000,
    "test_every": 1000,
    "num_save_copies": 2,
    "num_best_copies": 2,
    "ema": True,
    "ema_decay": 0.9999,
    "use_ema": True,
    "ema_start": 10000,
    "adam_eps": 1e-06,
    "BN_eps": 1e-05,
    "SN_eps": 1e-06,
    "num_G_SVs": 1,
    "num_D_SVs": 1,
    "num_G_SV_itrs": 1,
    "num_D_SV_itrs": 1,
    "G_ortho": 0.0001,
    "D_ortho": 0.0,
    "toggle_grads": True,
    "logstyle": "%3.3e",
    "sv_log_interval": 10,
    "log_interval": 100,
    "resolution": 256,
    "n_classes": 40,
    "run_name": "BGd_2718",
    "resume": False,
    "latent_op": False,
    "latent_reg_weight": 300,
    "bottom_width": 4,
    "add_blur": False,
    "add_noise": True,
    "add_style": False,
    "conditional_strategy": "Contra",
    "hypersphere_dim": 1024,
    "pos_collected_numerator": False,
    "nonlinear_embed": False,
    "normalize_embed": True,
    "inv_stereographic": False,
    "contra_lambda": 1.0,
    "Angle": False,
    "angle_lambda": 1.0,
    "IEA_loss": True,
    "IEA_lambda": 1.0,
    "Uniformity_loss": True,
    "unif_lambda": 0.1,
    "diff_aug": True,
    "Con_reg": False,
    "cr_lambda": 10,
    "pixel_reg": False,
    "px_lambda": 1.0,
    "RRM_prx_G": True,
    "normalized_proxy_G": False,
    "RRM_prx_D": False,
    "RRM_embed": True,
    "n_head_G": 2,
    "n_head": 4,
    "rdof_dim": 4,
    "prior_embed": False,
    "attn_type": "sa",
    "sched_version": "default",
    "z_dist": "normal",
    "truncated_threshold": 1.0,
    "clip_norm": None,
    "amsgrad": False,
    "G_kernel_size": 3,
    "D_kernel_size": 3,
    "ada_belief": False,
    "pbar": "tqdm",
    "which_best": "FID",
    "stop_after": 100000,
    "trunc_z": 0.5,
    "denoise": False,
    "metric_log_name": "metric_log.jsonl",
    "reinitialize_metric_logs": False,
    "reinitialize_parameter_logs": False,
    "num_incep_images": 16000,
    "load_optim": True,
    # --- TPU-native extensions (defaults preserve reference behavior) ---
    # Number of events per global batch. The reference trains one event (=40
    # images) per step; >1 events is the TPU data-parallel axis.
    "events_per_batch": 1,
    # Mesh shape for pjit: {"data": N} or {"data": N, "model": M}.
    "mesh": None,
    # Compute dtype: "bfloat16" (TPU-native default for parity-at-speed) or
    # "float32". Parameters and optimizer state are always float32.
    "compute_dtype": "bfloat16",
    # Use Pallas fused-attention kernels on TPU (falls back to XLA on CPU).
    "use_pallas_attention": True,
    # Synthetic-data batches per epoch for the --debug path.
    "debug_batches": 8,
    # jax.profiler trace hooks (reference has no tracing story).
    "trace_dir": None,
    "trace_start": 10,
    "trace_steps": 5,
    # FID dataset-stats name (reference hardcodes pxd_sim_test_com).
    "fid_dataset_name": "pxd_sim_test_com",
    # On-device scan chunks per FID generation dispatch.
    "fid_gen_chunks": 8,
    # z truncation for FID generation (reference metric uses trunc-trick
    # z at trunc=1, mycleanfid/fid.py:659,674-678); <=0 disables.
    "fid_trunc": 1.0,
    # FID pipeline variant: "clean" (bilinear, [0,1] — mycleanfid/fid.py) or
    # "clean_255" (bicubic, [0,255] — mycleanfid/fid-Copy_255.py).
    "fid_mode": "clean",
    # FID feature-extractor weights: a path, or "auto" = the finetuned PXD
    # backbone stats/inception_pxd.msgpack when present (the re-minted
    # analog of the reference's inception_V3_best.pt), else random-init.
    "fid_backbone": "auto",
    # Reference bit-parity for RR_D/RR_Dproxy: treat the whole D input batch
    # as ONE sequence (model.py:918,930) instead of per-event sequences.
    "rrm_full_batch_sequence": False,
    # Rows per class in the per-checkpoint sample sheet (0 disables).
    "samples_per_class_sheet": 4,
    # Rematerialize G/D blocks in the backward pass (jax.checkpoint):
    # ~30% more FLOPs for O(depth) activation memory — enables larger
    # events_per_batch per chip. True remats every block; "wide" remats
    # only the highest-resolution stages (last two of G, first two of D),
    # where activation bytes concentrate, at a fraction of full remat's
    # recompute.
    "remat": False,
    # Per-model remat overrides (None = inherit "remat"). The measured
    # sweet spot for lane-multiple batches (epb=3 -> B=120 -> one 128-lane
    # tile) is rematting only D: G's decoder recompute doubles the most
    # bandwidth-expensive activations while D's is cheap relative to its
    # backward (BASELINE.md r3/r4 lever table).
    "remat_G": None,
    "remat_D": None,
    # Reference quirk §2.4.1: G.optim.step() was gated on clip_norm; we step
    # G unconditionally. Set True to reproduce the reference bug exactly.
    "replicate_G_step_bug": False,
    # In-training FID evals run in a fresh subprocess on the just-saved
    # checkpoint (scripts/fid_eval_once.py): the flagship step's ~15G HBM
    # temp cannot absorb in-process eval residue on the tunneled chip, and
    # a clean client exit is the only proven reclaim. False = in-process
    # (CPU runs, tests, multi-process drivers).
    "fid_subprocess": True,
    # test_every companions: KID from the same feature pass as FID (needs
    # the <dataset>_..._kid.npz bank), and physics-stats accumulation over N
    # generated events (0 = off; pickle lands in the run dir). Subprocess
    # eval path only (fid_subprocess=True).
    "test_kid": False,
    "test_physics_events": 0,
    # Kill-and-skip budget for one eval subprocess run (seconds). The first
    # eval of a session compiles the sampling + Inception + physics graphs
    # on the tunneled chip; on a cold tunnel that exceeded 1800 s (r5: the
    # itr-11000 eval was killed at 30 min mid-compile and the test skipped,
    # even though the persistent cache was absorbing progress). Each killed
    # attempt still warms .jax_cache, but a skipped eval costs a test_every
    # window of best-rotation/trajectory data — size this above the
    # worst-case cold compile instead.
    "fid_subprocess_timeout": 3600.0,
    # Reference quirk: G_D augments only the generator output — reals reach
    # D raw (model.py:972-982), handing D a trivial fake tell (cutout holes
    # / translation bands exist only on fakes) that saturates D on any
    # dataset. True (default) applies DiffAugment to the real branch too,
    # per the DiffAugment paper; False reproduces upstream.
    "diff_aug_real": True,
    # Contrastive (2C/IEA) softmax temperature. The reference hardcodes
    # t = 1.0 for the Contra strategy (train_fns.py:46-47); exposed here as
    # a recipe lever for the round-4 physics residual (fewer-but-brighter
    # hits — docs/VALIDATION.md) A/B'd by scripts/physics_ab.py.
    "temperature": 1.0,
    # DiffAugment policy string (ops/diff_aug.py; Zhao et al. 2020 default
    # "color,translation,cutout"). Another physics_ab.py lever: weaker/
    # stronger augmentation shifts the D-overfitting vs fidelity trade.
    "diff_aug_policy": "color,translation,cutout",
    # Upload raw uint8 sensor images and run the pad/lognorm/noise transform
    # on device inside the jitted step (4x less host->device traffic; noise
    # comes from the jax RNG stream instead of the host numpy stream —
    # same U[0, 4e-3) distribution, different draws).
    "device_transform": False,
}


def load_config(path: str | None = None, overrides: Mapping[str, Any] | None = None) -> dict:
    """Load config: defaults <- JSON file <- explicit overrides.

    Mirrors the reference's ``json.load`` + ``dict.update(vars(args))``
    (reference: train.py:779-786) but is tolerant of unknown keys (the
    reference swallows extras through ``**kwargs``; we keep them in the dict).
    """
    config = copy.deepcopy(DEFAULT_CONFIG)
    if path is not None:
        with open(path, "r", encoding="utf-8") as fp:
            config.update(json.load(fp))
    if overrides:
        config.update({k: v for k, v in overrides.items() if v is not None})
    return config


def event_size(config: Mapping[str, Any]) -> int:
    """The intra-event axis length (number of sensors = classes).

    The reference hardcodes 40 in several paths (reference: model.py:466,
    ieagan.py:1312, mycleanfid/fid.py:673, utils/dataloader.py:53); here
    everything derives from ``n_classes`` (quirk fix, SURVEY.md §2.4.4).
    """
    return int(config["n_classes"])
