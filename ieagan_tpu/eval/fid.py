"""clean-FID engine: model features, custom stats, Fréchet and kernel
distances.

Faithful to the reference pipeline (reference: mycleanfid/fid.py):
  * per-image postprocess for FID (fid.py:681-687): threshold(-0.25, -1),
    [0,1], (256^x - 1)/255 clamp [0,1], crop rows 3:-3;
  * labels are a fresh permutation of the event classes per batch
    (fid.py:673), z via trunc-trick rejection sampling when trunc is set
    (fid.py:637-643);
  * resize: PIL single-channel float bilinear 299x299 -> 3-channel
    replication (fid.py:183-196, 690-697) — or the validated on-device
    equivalent for the fast TPU path;
  * features: InceptionV3 2048-d pooled (the PXD-finetuned backbone when
    its weights are available — see eval/inception.py);
  * FID: scipy sqrtm Fréchet distance (fid.py:431-468); KID: cubic-kernel
    MMD over subsets (fid.py:476-487);
  * reference statistics: "<name>_<mode>_custom_na.npz" files with mu/sigma
    (fid.py:392-407), minted by make_custom_stats (fid.py:832-867).
"""

from __future__ import annotations

import functools
import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from ieagan_tpu.eval.inception import InceptionV3Features, convert_torch_state_dict
from ieagan_tpu.eval.resize import pil_resize_batch, jax_resize_single_channel

STATS_DIR = os.environ.get(
    "IEAGAN_STATS_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "stats"))


# ---------------------------------------------------------------- features

@functools.lru_cache(maxsize=None)
def _shared_inception_apply(dtype):
    """One jitted Inception apply per dtype, shared across FeatureExtractor
    instances: scripts that build several extractors (kid_eval,
    moments_check, fid_parity) otherwise re-trace and re-compile the
    backbone per instance (~40s each on the tunneled chip)."""
    model = InceptionV3Features(dtype=dtype)
    return jax.jit(lambda p, x: model.apply({"params": p}, x))


# Loaded+uploaded backbone params keyed by (path, mtime): re-minting the
# backbone file invalidates the entry (stale-cache hazard flagged in the
# round-2 advisor review of the stats cache applies here identically).
_LOADED_WEIGHTS: dict = {}


class FeatureExtractor:
    """InceptionV3 feature extractor with optional torch-weight loading."""

    def __init__(self, weights_path: str | None = None, seed: int = 0,
                 dtype=jnp.float32):
        self.model = InceptionV3Features(dtype=dtype)
        if weights_path and not os.path.exists(weights_path):
            # an explicitly requested backbone that is absent must not
            # silently degrade to the random-init fallback: every FID the
            # run produces (incl. best-checkpoint selection) would be noise
            raise FileNotFoundError(
                f"FID backbone weights not found: {weights_path}")
        if not weights_path:
            weights_path = os.environ.get("IEAGAN_INCEPTION_WEIGHTS")
            if weights_path and not os.path.exists(weights_path):
                weights_path = None
        if weights_path:
            self.params = self._cached_load(weights_path)
            self.source = weights_path
        else:
            # Deterministic random-projection fallback (finetuned blob is
            # a missing LFS artifact upstream; see eval/inception.py).
            x = jnp.zeros((1, 299, 299, 3), jnp.float32)
            # jitted: eager flagship-size init is hundreds of tunnel
            # round-trips on a network-attached chip
            self.params = jax.jit(
                lambda: self.model.init(jax.random.PRNGKey(seed), x))()["params"]
            self.source = f"random-init(seed={seed})"
        self._apply = _shared_inception_apply(dtype)

    def _cached_load(self, path: str):
        key = (os.path.abspath(path), os.path.getmtime(path))
        if key not in _LOADED_WEIGHTS:
            from ieagan_tpu.utils.transfer import packed_device_put
            # one packed upload per (path, mtime): per-leaf device_put of
            # the ~300-array backbone over the network-attached chip costs
            # a tunnel round trip PER LEAF PER CALL (minutes) otherwise
            _LOADED_WEIGHTS.clear()  # at most one resident backbone copy
            _LOADED_WEIGHTS[key] = packed_device_put(self._load_torch(path))
        return _LOADED_WEIGHTS[key]

    def _load_torch(self, path):
        if path.endswith(".msgpack"):
            # flax params from scripts/finetune_inception.py
            from flax import serialization
            x = jnp.zeros((1, 299, 299, 3), jnp.float32)
            # structure-only deserialization target: no device work
            template = jax.eval_shape(
                lambda: self.model.init(jax.random.PRNGKey(0), x))["params"]
            with open(path, "rb") as fp:
                return serialization.from_bytes(template, fp.read())
        import torch
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj if isinstance(obj, dict) else obj.state_dict()
        return convert_torch_state_dict(sd)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """(B, 299, 299, 3) in [0,1] -> (B, 2048) float32."""
        return np.asarray(self._apply(self.params, jnp.asarray(images)))


# ------------------------------------------------------------- postprocess

def fid_postprocess(imgs: jnp.ndarray) -> jnp.ndarray:
    """Generator output (B, H, W, 1) in [-1,1] -> (B, H-6, W) in [0,1]
    (reference: fid.py:681-687, threshold -0.25 for FID vs -0.26 in
    generate())."""
    x = jnp.where(imgs > -0.25, imgs, -1.0)
    x = x * 0.5 + 0.5
    x = jnp.clip((jnp.power(256.0, x) - 1.0) / 255.0, 0.0, 1.0)
    return x[:, 3:-3, :, 0]


def trunc_trick(key, shape, bound: float = 1.0, max_iters: int = 16):
    """Rejection-resample z into (-bound, bound) (reference:
    utils/__init__.py:880-884), jit-friendly fixed-iteration variant."""
    def body(i, carry):
        z, key = carry
        key, sub = jax.random.split(key)
        fresh = jax.random.normal(sub, shape)
        z = jnp.where((z > -bound) & (z < bound), z, fresh)
        return z, key
    key, sub = jax.random.split(key)
    z = jax.random.normal(sub, shape)
    z, _ = jax.lax.fori_loop(0, max_iters, body, (z, key))
    return jnp.clip(z, -bound, bound)


# ------------------------------------------------------------- distances

def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance (reference: fid.py:431-468)."""
    from scipy import linalg
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


@jax.jit
def _frechet_device(mu1, sigma1, mu2, sigma2):
    """Fréchet distance fully on device: for PSD covariances,
    tr sqrtm(S1 S2) == sum sqrt eig(S1^1/2 S2 S1^1/2) with S1^1/2 from a
    symmetric eigendecomposition — no sigma crosses the tunnel.

    WARNING — f32-only on TPU, and at 2048 dims the eigh's absolute
    eigenvalue error scales with ||S1||·||S2||: tr_sqrt can be off by
    O(1e3), which swamps (and can negate) small FIDs. Fine for small
    feature dims (test-pinned at d=96); the in-training hook therefore
    downloads the device moments and finishes on host in f64
    (compute_fid), keeping this only for compact-feature use."""
    diff = mu1 - mu2
    w1, v1 = jnp.linalg.eigh(sigma1)
    root1 = (v1 * jnp.sqrt(jnp.clip(w1, 0.0, None))) @ v1.T
    m = root1 @ sigma2 @ root1
    wm = jnp.linalg.eigvalsh((m + m.T) * 0.5)
    tr_sqrt = jnp.sum(jnp.sqrt(jnp.clip(wm, 0.0, None)))
    return (diff @ diff + jnp.trace(sigma1) + jnp.trace(sigma2)
            - 2.0 * tr_sqrt)


def kernel_distance(feats1, feats2, num_subsets: int = 100,
                    max_subset_size: int = 1000, seed: int | None = None) -> float:
    """KID with the cubic polynomial kernel (reference: fid.py:476-487)."""
    rng = np.random.default_rng(seed)
    n = feats1.shape[1]
    m = min(min(feats1.shape[0], feats2.shape[0]), max_subset_size)
    t = 0.0
    for _ in range(num_subsets):
        x = feats2[rng.choice(feats2.shape[0], m, replace=False)]
        y = feats1[rng.choice(feats1.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.diag(a).sum()) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)


def kid_self_floor(ref_feats, seed: int | None = 0) -> float:
    """Real-vs-real KID of a half/half split of the reference features —
    the measurement floor a generator's KID should be read against
    (reference contract: fid.py:476-487 applied to two real splits).
    Round-4 verdict: every reported KID must carry this floor, or a
    200x fidelity gap reads like a small number."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(ref_feats.shape[0])
    half = len(idx) // 2
    return kernel_distance(ref_feats[idx[:half]], ref_feats[idx[half:]],
                           seed=seed)


# ------------------------------------------------------------ feature runs

def _mode_options(mode: str):
    """Pipeline variants: "clean" = bilinear resize, [0,1] inputs (fid.py);
    "clean_255" = bicubic resize, [0,255] inputs (fid-Copy_255.py:51,152)."""
    if mode == "clean_255":
        return "bicubic", 255.0
    return "bilinear", 1.0


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _moment_update(acc_s, acc_o, f, pilot):
    """Accumulate first/second moments of PILOT-CENTERED features.

    Centering by a first-batch pilot mean keeps the accumulated means near
    zero, so the one-pass sigma assembly (o - n*mu*mu^T) loses almost
    nothing to cancellation even in f32 at 2048 dims; precision='highest'
    makes the X^T X itself f32-accurate on the MXU (default TPU matmul
    precision is bf16-ish). Pinned against host f64 np.cov by
    tests/test_fid.py::test_device_moments_match_host_cov_2048d.
    """
    fc = (f - pilot).astype(jnp.float32)
    return (acc_s + fc.sum(0),
            acc_o + jnp.matmul(fc.T, fc, precision="highest"))


def get_model_features(gen_fn, extractor: FeatureExtractor, *, num_gen: int,
                       batch_size: int, rng, resize_on_device: bool = True,
                       mode: str = "clean", return_moments: bool = False):
    """Collect features from a generator callable.

    gen_fn(key) -> (N, H, W, 1) images in [-1, 1] with permuted labels
    inside (reference: fid.py:673-687). N may exceed batch_size (chunked
    generators amortize device dispatches — see make_generator_fn).

    return_moments=True returns (mu, sigma, n): features are centered by a
    first-batch pilot mean and X^T X accumulates on device at
    precision='highest'; the final mu/sigma are assembled in f64 on host
    from the downloaded accumulators (within f64-np.cov round-off,
    test-pinned at 2048 dims). This is the transfer-light mode for the
    in-training FID hook on a network-attached chip — 16MB of accumulator
    crosses the tunnel once per eval instead of num_gen×2048 features.
    """
    del batch_size  # sizing comes from gen_fn's output
    interp, scale = _mode_options(mode)
    feats = []
    total = 0
    post = jax.jit(lambda im: fid_postprocess(im) * scale)
    resize = (jax.jit(functools.partial(jax_resize_single_channel,
                                        interp=interp))
              if resize_on_device else None)
    if return_moments:
        # accumulate n/sum/X^T X on device; nothing bulky ever crosses the
        # tunnel (the Frechet distance is also computed on device)
        acc_s = jnp.zeros((2048,), jnp.float32)
        acc_o = jnp.zeros((2048, 2048), jnp.float32)
        pilot = None  # first-batch mean, fixed for the whole accumulation
    keys = jax.random.split(rng, 4096)
    i = 0
    while total < num_gen:
        imgs = gen_fn(keys[i])
        i += 1
        imgs01 = post(imgs)
        if resize_on_device:
            batch299 = resize(imgs01)
        else:
            batch299 = pil_resize_batch(np.asarray(imgs01), interp=interp)
        if return_moments:
            f_dev = extractor._apply(extractor.params, batch299)
            f_dev = f_dev[:num_gen - total]
            if pilot is None:
                pilot = f_dev.mean(0)
            acc_s, acc_o = _moment_update(acc_s, acc_o, f_dev, pilot)
            total += int(f_dev.shape[0])
        else:
            f = extractor(batch299)
            feats.append(f)
            total += f.shape[0]
    if return_moments:
        # download the two accumulators (16MB once per eval) and assemble
        # mu/sigma on host in f64 — matches the pinning test bit-for-bit
        # (tests/test_eval.py::test_device_moments_match_host_cov_2048d)
        s = np.asarray(acc_s, np.float64)
        o = np.asarray(acc_o, np.float64)
        p = np.asarray(pilot, np.float64)
        n = float(total)
        mu = p + s / n
        sigma = (o - n * np.outer(s / n, s / n)) / (n - 1.0)
        return mu, sigma, total
    return np.concatenate(feats)[:num_gen]


def get_folder_features(fdir, extractor: FeatureExtractor, num=None,
                        batch_size: int = 64, resize_on_device: bool = False,
                        mode: str = "clean"):
    """Features for all images in a folder (reference: make_custom_stats
    input path, fid.py:843-860). Images are loaded as single-channel [0,1]
    ("clean") or [0,255] ("clean_255")."""
    from PIL import Image
    interp, scale = _mode_options(mode)
    files = sorted(
        p for p in pathlib.Path(fdir).rglob("*")
        if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".bmp", ".tiff"))
    if num is not None:
        files = files[:num]
    feats = []
    for i in range(0, len(files), batch_size):
        chunk = files[i:i + batch_size]
        if resize_on_device:
            # upload uint8 (4x smaller than f32 over the network-attached
            # chip), scale + resize on device, and feed the extractor the
            # DEVICE array — no host round-trip between resize and features
            # (the round-trip was ~130MB/batch of tunnel traffic)
            raw = np.stack([np.asarray(Image.open(f).convert("L"), np.uint8)
                            for f in chunk])
            imgs_dev = jnp.asarray(raw).astype(jnp.float32) * (scale / 255.0)
            batch299 = jax_resize_single_channel(imgs_dev, interp=interp)
        else:
            imgs = np.stack([
                np.asarray(Image.open(f).convert("L"), np.float32)
                * (scale / 255.0) for f in chunk])
            batch299 = pil_resize_batch(imgs, interp=interp)
        feats.append(extractor(batch299))
    return np.concatenate(feats)


# --------------------------------------------------------------- stats API

def _stats_path(name: str, mode: str = "clean", split: str = "custom",
                res: str = "na") -> str:
    return os.path.join(STATS_DIR, f"{name}_{mode}_{split}_{res}.npz".lower())


def get_reference_statistics(name: str, mode: str = "clean",
                             split: str = "custom", res: str = "na"):
    path = _stats_path(name, mode, split, res)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"reference statistics {path} not found; mint them with "
            "ieagan_tpu.eval.fid.make_custom_stats")
    stats = np.load(path)
    return stats["mu"], stats["sigma"]


def make_custom_stats(name: str, fdir: str, num=None, mode: str = "clean",
                      batch_size: int = 64,
                      extractor: FeatureExtractor | None = None,
                      overwrite: bool = False,
                      resize_on_device: bool = False) -> str:
    """Mint mu/sigma reference stats from a folder of real images
    (reference: fid.py:832-867). resize_on_device trades the PIL host
    resize for the validated on-device equivalent (use it when the FID
    consumer also resizes on device — self-consistent and ~20x faster on
    a 1-core host)."""
    extractor = extractor or FeatureExtractor()
    path = _stats_path(name, mode)
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(f"statistics file {path} already exists")
    feats = get_folder_features(fdir, extractor, num=num,
                                batch_size=batch_size, mode=mode,
                                resize_on_device=resize_on_device)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, mu=np.mean(feats, axis=0),
                        sigma=np.cov(feats, rowvar=False))
    return path


# ----------------------------------------------------------- top-level API

def make_custom_kid_stats(name: str, fdir: str, num=None, mode: str = "clean",
                          batch_size: int = 64,
                          extractor: FeatureExtractor | None = None,
                          overwrite: bool = False,
                          resize_on_device: bool = False) -> str:
    """Mint raw-feature KID stats ("<name>_<mode>_custom_na_kid.npz",
    reference: fid.py:402-407)."""
    extractor = extractor or FeatureExtractor()
    path = _stats_path(name, mode).replace(".npz", "_kid.npz")
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(f"statistics file {path} already exists")
    feats = get_folder_features(fdir, extractor, num=num,
                                batch_size=batch_size, mode=mode,
                                resize_on_device=resize_on_device)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, feats=feats)
    return path


def compute_kid(gen_fn=None, fdir1=None, fdir2=None, *,
                dataset_name: str = "pxd_sim_test_com", num_gen: int = 16000,
                batch_size: int = 40, rng=None,
                extractor: FeatureExtractor | None = None,
                resize_on_device: bool = True, seed: int | None = 0,
                mode: str = "clean"):
    """KID for a generator against stored raw features, or between folders
    (the reference implements kernel_distance but never wires it into the
    loop, fid.py:476-487 — here it is a first-class metric)."""
    extractor = extractor or FeatureExtractor()
    if fdir1 is not None and fdir2 is not None:
        f1 = get_folder_features(fdir1, extractor, batch_size=batch_size,
                                 mode=mode)
        f2 = get_folder_features(fdir2, extractor, batch_size=batch_size,
                                 mode=mode)
        return kernel_distance(f1, f2, seed=seed)
    path = _stats_path(dataset_name, mode).replace(".npz", "_kid.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"KID reference features {path} not found; mint them with "
            "make_custom_kid_stats")
    ref_feats = np.load(path)["feats"]
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    feats = get_model_features(gen_fn, extractor, num_gen=num_gen,
                               batch_size=batch_size, rng=rng,
                               resize_on_device=resize_on_device, mode=mode)
    return kernel_distance(feats, ref_feats, seed=seed)




def compute_fid(gen_fn=None, fdir1=None, fdir2=None, *,
                dataset_name: str = "pxd_sim_test_com", num_gen: int = 16000,
                batch_size: int = 40, rng=None,
                extractor: FeatureExtractor | None = None,
                resize_on_device: bool = True,
                return_features: bool = False,
                moments_on_device: bool = False,
                mode: str = "clean"):
    """FID for a generator against dataset stats, or between two folders
    (reference: fid.py:870-942; mode="clean_255" selects the
    fid-Copy_255.py bicubic/[0,255] variant)."""
    extractor = extractor or FeatureExtractor()
    if fdir1 is not None and fdir2 is not None:
        f1 = get_folder_features(fdir1, extractor, batch_size=batch_size,
                                 mode=mode)
        f2 = get_folder_features(fdir2, extractor, batch_size=batch_size,
                                 mode=mode)
        fid = frechet_distance(np.mean(f1, 0), np.cov(f1, rowvar=False),
                               np.mean(f2, 0), np.cov(f2, rowvar=False))
        return (fid, f1, f2) if return_features else fid
    if gen_fn is None:
        raise ValueError("need gen_fn or two folders")
    ref_mu, ref_sigma = get_reference_statistics(dataset_name, mode=mode)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if moments_on_device and not return_features:
        mu, sigma, _ = get_model_features(
            gen_fn, extractor, num_gen=num_gen, batch_size=batch_size,
            rng=rng, resize_on_device=resize_on_device, mode=mode,
            return_moments=True)
        # Moments accumulate on device (pilot-centered, precision='highest'
        # — test-pinned against host-f64 np.cov at 2048 dims); the Fréchet
        # itself finishes on HOST in f64. A f32 eigh-based tr sqrtm(S1 S2)
        # at 2048 dims overestimates by O(1e3) once the distributions get
        # close (observed: in-training FID of -54 mid-campaign, which
        # poisons best-checkpoint tracking), while downloading the 16MB
        # sigma once per eval is trivial next to feature extraction.
        return float(frechet_distance(np.asarray(mu, np.float64),
                                      np.asarray(sigma, np.float64),
                                      ref_mu, ref_sigma))
    feats = get_model_features(gen_fn, extractor, num_gen=num_gen,
                               batch_size=batch_size, rng=rng,
                               resize_on_device=resize_on_device, mode=mode)
    fid = frechet_distance(np.mean(feats, 0), np.cov(feats, rowvar=False),
                           ref_mu, ref_sigma)
    return (fid, feats) if return_features else fid


def make_generator_fn(G, params, state, config, trunc: float | None = None,
                      chunks: int = 1):
    """Build gen_fn(key) -> chunks event batches with permuted labels
    (reference: fid.py:670-680). chunks>1 scans on device — one dispatch
    per chunks*events batches (dispatch amortization for network-attached
    chips; see docs/DESIGN.md)."""
    es = int(config["n_classes"])
    epb = int(config.get("events_per_batch", 1))
    dim_z = int(config["dim_z"])

    # params/state are explicit ARGUMENTS of the jitted programs: baked-in
    # constants would change the HLO every checkpoint, forcing a full
    # generator recompile per FID eval (measured ~5min each on the driver's
    # test_every cadence); as arguments the executable caches once.
    def one_batch(variables, key):
        kz, ky, kr = jax.random.split(key, 3)
        if trunc is not None:
            z = trunc_trick(kz, (es * epb, dim_z), bound=trunc)
        else:
            z = jax.random.normal(kz, (es * epb, dim_z))
        perms = [jax.random.permutation(jax.random.fold_in(ky, i), es)
                 for i in range(epb)]
        y = jnp.concatenate(perms)
        return G.apply(variables, z, y, train=False, rngs={"rdof": kr})

    variables = {"params": params, **state}
    if chunks == 1:
        jitted1 = jax.jit(one_batch)
        return lambda key: jitted1(variables, key)

    @jax.jit
    def gen_many(variables, key):
        def body(carry, i):
            return carry, one_batch(variables, jax.random.fold_in(key, i))
        _, out = jax.lax.scan(body, 0, jnp.arange(chunks))
        return out.reshape(chunks * es * epb, *out.shape[2:])

    return lambda key: gen_many(variables, key)


_EXTRACTOR_CACHE: dict = {}


def default_extractor(config=None) -> FeatureExtractor:
    """The metric-defining extractor: config["fid_backbone"] path, or
    ("auto") the finetuned PXD backbone stats/inception_pxd.msgpack when it
    exists (the re-minted analog of the reference's inception_V3_best.pt,
    mycleanfid/fid.py:33-64), else the deterministic random-init fallback.
    Cached per path — the driver hook runs every test_every steps and the
    backbone is ~87MB."""
    backbone = (config or {}).get("fid_backbone", "auto")
    if backbone == "auto":
        cand = os.path.join(STATS_DIR, "inception_pxd.msgpack")
        backbone = cand if os.path.exists(cand) else None
    if backbone not in _EXTRACTOR_CACHE:
        _EXTRACTOR_CACHE[backbone] = FeatureExtractor(weights_path=backbone,
                                                      seed=0)
    return _EXTRACTOR_CACHE[backbone]


def compute_fid_from_state(G, train_state, config):
    """Driver hook (reference: train_fns.py:209-233): FID of the (EMA)
    generator vs the configured dataset stats."""
    use_ema = bool(config.get("ema")) and bool(config.get("use_ema"))
    params = train_state.params_G_ema if use_ema else train_state.params_G
    state = train_state.state_G_ema if use_ema else train_state.state_G
    # The reference metric generates with trunc-trick z at trunc=1
    # (mycleanfid/fid.py:659,674-678); fid_trunc<=0 opts out.
    trunc = float(config.get("fid_trunc", 1.0))
    gen = make_generator_fn(G, params, state, config,
                            trunc=trunc if trunc > 0 else None,
                            chunks=int(config.get("fid_gen_chunks", 8)))
    return compute_fid(
        gen, dataset_name=config.get("fid_dataset_name", "pxd_sim_test_com"),
        num_gen=int(config.get("num_incep_images", 16000)),
        batch_size=int(config["n_classes"]) * int(config.get("events_per_batch", 1)),
        rng=jax.random.PRNGKey(int(config.get("seed", 0))),
        extractor=default_extractor(config),
        # transfer-light device moments: the periodic training hook needs
        # the FID trend, not bit-parity with host f64 np.cov (strict-parity
        # runs use scripts/fid_parity.py, which keeps the host path)
        moments_on_device=bool(config.get("fid_moments_on_device", True)),
        mode=config.get("fid_mode", "clean"))
