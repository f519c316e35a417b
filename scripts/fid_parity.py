#!/usr/bin/env python3
"""FID metric-parity proof: reference mycleanfid pipeline vs ieagan_tpu.

Runs the REFERENCE repo's own FID-of-a-generator code path
(mycleanfid/fid.py fid_model -> get_model_features: torch trunc-trick z,
torch randperm labels, thresh/pow/crop postprocess, PIL bilinear resize,
np.cov + scipy-sqrtm Frechet) and OUR pipeline
(ieagan_tpu.eval.fid.compute_fid) on:

  * the SAME generator weights (reference torch Generator, randomly
    initialized, converted to flax via models/convert.py — the converters
    are model-parity-tested to <5e-4 max pixel error),
  * the SAME feature-extractor weights (our flax InceptionV3, injected into
    the reference pipeline as the `model=` argument — the reference's own
    finetuned torchscript backbone is a missing LFS blob upstream, and
    neither torchvision nor timm exists in this image, so the backbone
    weights are shared by construction; the graph is block-level
    torch-oracle-tested in tests/test_eval.py),
  * the SAME reference statistics npz.

The remaining delta is exactly what the north-star "clean-FID within 1%"
target measures: generation RNG sampling noise + resize/numeric
implementation differences.

Environment shims: the reference module imports cv2/torchvision/cleanfid at
module scope but uses them only on untaken paths (OpenCV resizer, backbone
download); they are absent from this image and stubbed before import. Its
get_reference_statistics hardcodes the read-only reference dir as the stats
location, so that one symbol is pointed at our stats file instead.

Usage:
  python scripts/fid_parity.py [--num-gen 4000] [--backbone x.msgpack]
                               [--cpu] [--tolerance 0.01]
Prints one JSON line {"fid_reference":..., "fid_ours":..., "rel_diff":...}
and exits nonzero if rel_diff > tolerance.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("IEAGAN_REFERENCE", "/root/reference")
sys.path.insert(0, REPO)

# Shared tiny-but-RRM generator config (mirrors tests/test_model_parity.py;
# n_classes must be 40: the reference FID loop hardcodes randperm(40),
# fid.py:674; shared_dim must be 128 for the reference RRM sizing,
# model.py:303,316-320).
GEN_CFG = dict(
    G_ch=8, G_depth=2, dim_z=16, bottom_width=4, resolution=64,
    G_attn="0", n_classes=40, H_base=1, G_shared=True, shared_dim=128,
    hier=True, G_activation="relu", BN_eps=1e-5, SN_eps=1e-6,
    RRM_prx_G=True, rdof_dim=0, n_head_G=2, G_param="SN", norm_style="bn",
)


def import_reference_fid():
    for name in ("cv2", "torchvision"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    # the reference builds its resizer table at module scope (fid.py:140-148)
    cv2 = sys.modules["cv2"]
    for i, attr in enumerate(["INTER_NEAREST", "INTER_LINEAR", "INTER_CUBIC",
                              "INTER_AREA", "INTER_LANCZOS4"]):
        if not hasattr(cv2, attr):
            setattr(cv2, attr, i)
    if "cleanfid" not in sys.modules:
        pkg = types.ModuleType("cleanfid")
        dh = types.ModuleType("cleanfid.downloads_helper")
        ip = types.ModuleType("cleanfid.inception_pytorch")
        ip.InceptionV3 = object
        pkg.downloads_helper, pkg.inception_pytorch = dh, ip
        sys.modules.update({"cleanfid": pkg,
                            "cleanfid.downloads_helper": dh,
                            "cleanfid.inception_pytorch": ip})
    sys.path.insert(0, REFERENCE)
    import mycleanfid.fid as ref_fid
    return ref_fid


class TorchFeatureShim:
    """Duck-typed torch module feeding the reference pipeline's batches
    (NCHW [0,1]) through our extractor — same weights on both sides."""

    def __init__(self, extractor):
        self.extractor = extractor

    def __call__(self, batch):
        import torch
        x = batch.detach().cpu().numpy().transpose(0, 2, 3, 1)
        return torch.from_numpy(self.extractor(x))

    def to(self, device):
        return self

    def eval(self):
        return self


def run_shared_z(args, ref_fid, ref_g, G, params, state, extractor,
                 stats_path):
    """Both pipelines on IDENTICAL z/label batches (torch trunc-trick draws,
    the reference's exact z distribution, fid.py:637-643). The residual FID
    difference is purely implementation: model numerics (converter-parity
    <5e-4 px), postprocess, resize (PIL vs on-device), feature extraction,
    covariance + sqrtm Fréchet."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from ieagan_tpu.eval import fid as fid_mod

    if args.num_gen < 40:
        raise SystemExit(f"--num-gen must be >= 40 (one event); "
                         f"got {args.num_gen}")
    if args.num_gen % 40:
        # round up: truncating would silently report more samples than ran
        print(f"num_gen {args.num_gen} is not a multiple of 40; "
              f"using {(args.num_gen // 40 + 1) * 40}", file=sys.stderr)
    n_batches = (args.num_gen + 39) // 40
    args.num_gen = n_batches * 40
    batches = []
    torch.manual_seed(123)
    for _ in range(n_batches):
        z = ref_fid.trunc_trick(40, GEN_CFG["dim_z"], bound=1)
        y = torch.randperm(40)
        batches.append((z, y))

    # ---- reference side: their loop (fid.py:654-703) with the fixed draws,
    # using their thresh/postprocess/resizer functions verbatim
    resizer = ref_fid.build_resizer("clean")
    feats_ref = []
    t0 = time.time()
    with torch.no_grad():
        for z, y in batches:
            img = ref_g(z, y)
            img = ref_fid.thresh(img)
            img = img.mul_(0.5).add_(0.5)
            img = torch.pow(256, img).add_(-1).div_(255).clamp_(0, 1)
            img = img[:, 0, 3:-3, :].unsqueeze(1)
            resized = torch.zeros(img.shape[0], 3, 299, 299)
            for i in range(img.shape[0]):
                r = resizer(img[i].cpu().numpy().transpose(1, 2, 0))
                resized[i] = torch.tensor(r.transpose(2, 0, 1))
            x = resized.numpy().transpose(0, 2, 3, 1)
            feats_ref.append(extractor(x))
    feats_ref = np.concatenate(feats_ref)
    t_ref = time.time() - t0

    # ---- our side: our pipeline functions on the same draws
    apply_fn = jax.jit(lambda z, y: G.apply(
        {"params": params, **state}, z, y, train=False,
        rngs={"rdof": jax.random.PRNGKey(0)}))
    post = jax.jit(fid_mod.fid_postprocess)
    resize = jax.jit(fid_mod.jax_resize_single_channel)
    feats_ours = []
    t0 = time.time()
    for z, y in batches:
        imgs = apply_fn(jnp.asarray(z.numpy()), jnp.asarray(y.numpy()))
        imgs01 = post(imgs)
        batch299 = (fid_mod.pil_resize_batch(np.asarray(imgs01))
                    if args.host_resize else resize(imgs01))
        feats_ours.append(extractor(np.asarray(batch299)))
    feats_ours = np.concatenate(feats_ours)
    t_ours = time.time() - t0

    mu_sigma = np.load(stats_path)
    mu_r, sig_r = mu_sigma["mu"], mu_sigma["sigma"]
    fid_ref_v = float(ref_fid.frechet_distance(
        np.mean(feats_ref, 0), np.cov(feats_ref, rowvar=False), mu_r, sig_r))
    fid_ours_v = fid_mod.frechet_distance(
        np.mean(feats_ours, 0), np.cov(feats_ours, rowvar=False), mu_r, sig_r)
    rel = abs(fid_ours_v - fid_ref_v) / max(abs(fid_ref_v), 1e-9)
    feat_rel = float(np.linalg.norm(feats_ours - feats_ref)
                     / (np.linalg.norm(feats_ref) + 1e-12))
    print(json.dumps({
        "mode": "shared_z", "fid_reference": round(fid_ref_v, 4),
        "fid_ours": round(fid_ours_v, 4), "rel_diff": round(rel, 5),
        "feature_rel_err": round(feat_rel, 5), "num_gen": args.num_gen,
        "host_resize": args.host_resize, "backbone": extractor.source,
        "ref_seconds": round(t_ref, 1), "ours_seconds": round(t_ours, 1)}))
    if rel > args.tolerance:
        print(f"PARITY FAIL: rel_diff {rel:.4f} > {args.tolerance}",
              file=sys.stderr)
        sys.exit(1)
    print(f"PARITY OK: rel_diff {rel:.4f} <= {args.tolerance}",
          file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-gen", type=int, default=4000)
    ap.add_argument("--backbone", default=None,
                    help="extractor weights (msgpack/pt); default: the "
                         "finetuned stats/inception_pxd.msgpack if present, "
                         "else seeded random init")
    ap.add_argument("--stats-dir", default="/tmp/fid_parity_stats")
    ap.add_argument("--real-dir", default="/tmp/synpxd40_test",
                    help="folder of real images for the shared stats")
    ap.add_argument("--num-real", type=int, default=2000)
    ap.add_argument("--tolerance", type=float, default=0.01)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--precision", default=None,
                    choices=[None, "default", "high", "highest"],
                    help="jax_default_matmul_precision for our side")
    ap.add_argument("--host-resize", action="store_true",
                    help="our pipeline resizes on host with PIL (the "
                         "reference's exact path) instead of on device")
    ap.add_argument("--checkpoint", default=None,
                    help="G/G_ema msgpack (or weights dir) trained in THIS "
                         "framework at the GEN_CFG shapes; exported to the "
                         "torch side via models/convert.py::"
                         "export_generator_to_torch — measures parity on a "
                         "TRAINED generator (sane FID regime, "
                         "well-conditioned feature covariance) instead of "
                         "a random-init one")
    ap.add_argument("--seeds", default="7",
                    help="comma-separated jax seeds for our pipeline; >1 "
                         "seeds also reports the generation-RNG noise floor")
    ap.add_argument("--skip-ref", action="store_true",
                    help="skip the (slow torch) reference side; only run "
                         "ours across --seeds")
    ap.add_argument("--shared-z", action="store_true",
                    help="feed the SAME torch-sampled z/labels through both "
                         "pipelines — removes generation-RNG sampling noise "
                         "so the residual isolates postprocess + resize + "
                         "extractor + Fréchet implementation parity")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.precision:
        # "highest" = true fp32 matmuls on TPU (default is bf16-pass MXU) —
        # isolates TPU matmul rounding from pipeline differences
        jax.config.update("jax_default_matmul_precision", args.precision)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np
    import torch
    torch.manual_seed(0)

    from ieagan_tpu.eval import fid as fid_mod
    from ieagan_tpu.models import Generator
    from ieagan_tpu.models.convert import (convert_torch_generator,
                                           load_into_variables)

    backbone = args.backbone
    if backbone is None:
        default = os.path.join(REPO, "stats", "inception_pxd.msgpack")
        backbone = default if os.path.exists(default) else None
    extractor = fid_mod.FeatureExtractor(weights_path=backbone, seed=0)
    print(f"extractor weights: {extractor.source}", file=sys.stderr)

    # ---- shared stats (minted once with the shared extractor)
    fid_mod.STATS_DIR = args.stats_dir
    stats_name = "fidparity"
    stats_path = fid_mod._stats_path(stats_name, "clean")
    if not os.path.exists(stats_path):
        t0 = time.time()
        fid_mod.make_custom_stats(stats_name, args.real_dir,
                                  num=args.num_real, extractor=extractor)
        print(f"stats minted from {args.real_dir} in {time.time()-t0:.0f}s",
              file=sys.stderr)

    # ---- the one generator, both frameworks
    ref_fid = import_reference_fid()
    sys.path.insert(0, REFERENCE)
    import model as ref_model
    ref_g = ref_model.Generator(**dict(GEN_CFG, skip_init=False,
                                       no_optim=True, G_init="ortho",
                                       device="cpu"))
    ref_g.eval()

    G = Generator.from_config(dict(GEN_CFG, use_pallas_attention=False))
    z0 = jnp.zeros((40, GEN_CFG["dim_z"]))
    y0 = jnp.arange(40)
    variables = G.init({"params": jax.random.PRNGKey(0),
                        "rdof": jax.random.PRNGKey(1)}, z0, y0, train=False)
    if args.checkpoint:
        # trained-in-this-framework weights on BOTH sides: load ours, export
        # flax -> torch (round-trip parity-tested <5e-4 px)
        import torch as _torch
        from flax import serialization
        from ieagan_tpu.models.convert import export_generator_to_torch
        ckpt = args.checkpoint
        if os.path.isdir(ckpt):
            from ieagan_tpu.utils.checkpoint import latest_checkpoint
            tag = latest_checkpoint(ckpt)
            for base in ("G_ema", "G"):
                cand = os.path.join(
                    ckpt, f"{base}_{tag}.msgpack" if tag else f"{base}.msgpack")
                if os.path.exists(cand):
                    ckpt = cand
                    break
        print(f"checkpoint: {ckpt}", file=sys.stderr)
        tmpl = {"params": variables["params"],
                "state": {k: v for k, v in variables.items()
                          if k != "params"}}
        with open(ckpt, "rb") as fp:
            tree = serialization.from_bytes(tmpl, fp.read())
        variables = {"params": tree["params"], **tree["state"]}
        sd = export_generator_to_torch(variables, ref_g.state_dict(),
                                       g_depth=GEN_CFG["G_depth"])
        ref_g.load_state_dict({k: _torch.from_numpy(np.array(v))
                               for k, v in sd.items()})
        ref_g.eval()
    else:
        variables = load_into_variables(
            dict(variables),
            convert_torch_generator(ref_g.state_dict(),
                                    g_depth=GEN_CFG["G_depth"]))
    params = variables["params"]
    state = {k: v for k, v in variables.items() if k != "params"}

    if args.shared_z:
        run_shared_z(args, ref_fid, ref_g, G, params, state, extractor,
                     stats_path)
        return

    # ---- reference pipeline number (their code, our stats file injected —
    # their loader hardcodes the read-only module dir, fid.py:396-401)
    fid_ref = t_ref = None
    if not args.skip_ref:
        mu_sigma = np.load(stats_path)
        ref_fid.get_reference_statistics = (
            lambda *a, **k: (mu_sigma["mu"], mu_sigma["sigma"]))
        shim = TorchFeatureShim(extractor)
        t0 = time.time()
        with torch.no_grad():
            fid_ref = float(ref_fid.fid_model(
                ref_g, stats_name, "na", "custom", model=shim,
                z_dim=GEN_CFG["dim_z"], trunc=1, num_gen=args.num_gen,
                mode="clean", batch_size=40, device=torch.device("cpu")))
        t_ref = time.time() - t0
        print(f"reference pipeline: FID {fid_ref:.4f} in {t_ref:.0f}s",
              file=sys.stderr)

    # ---- our pipeline number(s)
    cfg = dict(GEN_CFG, events_per_batch=1, use_pallas_attention=False)
    gen = fid_mod.make_generator_fn(G, params, state, cfg, trunc=1.0,
                                    chunks=8)
    seeds = [int(s) for s in str(args.seeds).split(",") if s != ""]
    fids_ours, t_ours = [], 0.0
    for seed in seeds:
        t0 = time.time()
        fids_ours.append(float(fid_mod.compute_fid(
            gen, dataset_name=stats_name, num_gen=args.num_gen,
            batch_size=40, rng=jax.random.PRNGKey(seed),
            extractor=extractor,
            resize_on_device=not args.host_resize)))
        t_ours = time.time() - t0
        print(f"our pipeline (seed {seed}): FID {fids_ours[-1]:.4f} "
              f"in {t_ours:.0f}s", file=sys.stderr)
    fid_ours = fids_ours[0]

    out = {"fid_ours": round(fid_ours, 4), "num_gen": args.num_gen,
           "backbone": extractor.source, "host_resize": args.host_resize,
           "ours_seconds": round(t_ours, 1)}
    if len(fids_ours) > 1:
        # generation-RNG sampling noise floor: spread across our own seeds
        arr = np.asarray(fids_ours)
        out["ours_seed_spread_rel"] = round(
            float((arr.max() - arr.min()) / arr.mean()), 5)
        out["fid_ours_all"] = [round(f, 4) for f in fids_ours]
    if fid_ref is not None:
        rel = abs(fid_ours - fid_ref) / max(abs(fid_ref), 1e-9)
        out.update({"fid_reference": round(fid_ref, 4),
                    "rel_diff": round(rel, 5),
                    "ref_seconds": round(t_ref, 1)})
    print(json.dumps(out))
    if fid_ref is not None:
        if rel > args.tolerance:
            print(f"PARITY FAIL: rel_diff {rel:.4f} > {args.tolerance}",
                  file=sys.stderr)
            sys.exit(1)
        print(f"PARITY OK: rel_diff {rel:.4f} <= {args.tolerance}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
