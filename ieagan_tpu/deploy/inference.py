"""Standalone generator-only inference module — the basf2 deployment twin.

Equivalent of the reference's frozen ``ieagan.py`` (reference:
ieagan.py:24-152 frozen CONFIG, 1334-1340 Model, 1343-1366 generate): a
self-contained generator with a frozen flagship config and the exact
postprocess contract — 40 latents -> (40, 250, 768) ADU images with the
-0.26 amplitude threshold ("cut the noise below 7 ADU").

The forward + postprocess is one jitted XLA program; nothing leaves the
device until the final (event_size, 250, 768) array.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ieagan_tpu.core.config import DEFAULT_CONFIG
from ieagan_tpu.models.generator import Generator
from ieagan_tpu.ops.image_norm import generate_postprocess

# Frozen deployment configuration (reference: ieagan.py:24-152). The
# deployment copy differs from the training config.json in a few
# inference-only fields (seed 415, D_attn "0" — no discriminator ships).
FROZEN_CONFIG = dict(DEFAULT_CONFIG, seed=415, D_attn="0",
                     model="BigGAN_deep")


def _import_reference_model(ref_dir: str):
    """Import the reference repo's top-level ``model`` module without
    clobbering the embedding application's own modules: the reference uses
    generic top-level names (model, layers, RRM, diff_aug) that are very
    likely already taken in a host process, so shadowed entries are popped
    for the duration of the import and restored afterwards."""
    import importlib
    import sys
    names = ("model", "layers", "RRM", "diff_aug")
    shadowed = {n: sys.modules.pop(n) for n in names if n in sys.modules}
    sys.path.insert(0, ref_dir)
    try:
        mod = importlib.import_module("model")
    finally:
        sys.path.remove(ref_dir)
        for n in names:
            sys.modules.pop(n, None)
        sys.modules.update(shadowed)
    return mod


def resolve_generator_checkpoint(weights_path: str, tag: str | None = None,
                                 use_ema: bool = True) -> str:
    """Resolve a weights dir to a concrete generator checkpoint file.

    Driver runs tag every component (``G_ema_copy<N>.msgpack``,
    ``G_ema_best<N>.msgpack`` — utils/checkpoint.py); untagged
    ``G_ema.msgpack``/``G.msgpack`` only exist for hand-exported files.
    A file path is returned as-is. With ``tag=None`` the newest copy tag
    (by stored itr) is used.
    """
    import os
    if not os.path.isdir(weights_path):
        return weights_path
    if tag is None:
        from ieagan_tpu.utils.checkpoint import latest_checkpoint
        tag = latest_checkpoint(weights_path)
    names = (["G_ema", "G"] if use_ema else ["G"])
    for base in names:
        cand = os.path.join(
            weights_path,
            f"{base}_{tag}.msgpack" if tag else f"{base}.msgpack")
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"no generator checkpoint under {weights_path}"
        + (f" for tag '{tag}'" if tag else ""))


class Model:
    """Generator + parameters, ready to generate events.

    ``Model(config)`` builds a randomly initialized generator (reference
    parity: model.Model, model.py:1124-1127); ``Model.restore(path)`` loads
    checkpointed parameters.
    """

    def __init__(self, config: dict | None = None, params=None, state=None,
                 seed: int = 0, dtype: Any = jnp.float32,
                 _abstract: bool = False):
        self.config = dict(FROZEN_CONFIG)
        if config:
            self.config.update(config)
        self.module = Generator.from_config(self.config, dtype=dtype)
        self.event_size = int(self.config["n_classes"])
        if params is None:
            z = jnp.zeros((self.event_size, self.config["dim_z"]), jnp.float32)
            y = jnp.arange(self.event_size, dtype=jnp.int32)

            def _init():
                return self.module.init(
                    {"params": jax.random.PRNGKey(seed),
                     "rdof": jax.random.PRNGKey(seed + 1)}, z, y, train=False)

            # jit (one compiled dispatch) vs eager init: the unjitted
            # flagship init runs hundreds of per-op round trips over the
            # network-attached chip (minutes). restore()/from_torch() only
            # need the tree STRUCTURE as a deserialization target, so they
            # trace with eval_shape — zero device work.
            variables = jax.eval_shape(_init) if _abstract else jax.jit(_init)()
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}
        self.params = params
        self.state = state if state is not None else {}

    @classmethod
    def restore(cls, weights_path: str, config: dict | None = None,
                use_ema: bool = True, dtype: Any = jnp.float32,
                tag: str | None = None) -> "Model":
        """Load a Model from a checkpoint: a weights dir (picks
        G_ema/G + latest copy tag, or an explicit ``tag`` like "best0")
        or a single G*.msgpack file."""
        from flax import serialization
        model = cls(config=config, dtype=dtype, _abstract=True)
        path = resolve_generator_checkpoint(weights_path, tag=tag,
                                            use_ema=use_ema)
        with open(path, "rb") as fp:
            tree = serialization.from_bytes(
                {"params": model.params, "state": model.state}, fp.read())
        from ieagan_tpu.utils.transfer import packed_device_put
        # one packed upload instead of per-leaf tunnel round trips on the
        # first generate() call (minutes for the flagship tree)
        tree = packed_device_put(tree)
        model.params, model.state = tree["params"], tree["state"]
        return model

    @classmethod
    def from_torch(cls, state_dict_path: str, config: dict | None = None,
                   dtype: Any = jnp.float32) -> "Model":
        """Load a Model from a reference-layout PyTorch Generator state dict
        (.pth) via models/convert.py — upstream-trained checkpoints run
        natively (parity pinned by tests/test_model_parity.py)."""
        import torch
        from ieagan_tpu.models.convert import (convert_torch_generator,
                                               load_into_variables)
        model = cls(config=config, dtype=dtype)
        sd = torch.load(state_dict_path, map_location="cpu",
                        weights_only=False)
        if not isinstance(sd, dict):
            sd = sd.state_dict()
        converted = convert_torch_generator(
            sd, g_depth=int(model.config.get("G_depth", 2)))
        variables = load_into_variables(
            {"params": model.params, **model.state}, converted)
        from ieagan_tpu.utils.transfer import packed_device_put
        variables = packed_device_put(variables)
        model.params = variables.pop("params")
        model.state = variables
        return model

    def export_torch(self, out_path: str) -> str:
        """Export this generator as a reference-layout PyTorch state dict
        (.pth) loadable by the reference implementation (model.py:139-487 /
        ieagan.py) — the migration path back. Round-trip forward parity is
        pinned by tests/test_model_parity.py (<5e-4 px)."""
        import torch
        from ieagan_tpu.models.convert import export_generator_to_torch
        ref_dir = self.config.get("reference_dir", "/root/reference")
        ref_model = _import_reference_model(ref_dir)
        torch.manual_seed(0)
        ref_g = ref_model.Generator(**{
            k: self.config[k] for k in (
                "G_ch", "G_depth", "dim_z", "bottom_width", "resolution",
                "G_attn", "n_classes", "H_base", "G_shared", "shared_dim",
                "hier", "G_activation", "BN_eps", "SN_eps", "RRM_prx_G",
                "rdof_dim", "n_head_G", "G_param", "norm_style")
            if k in self.config} | dict(skip_init=True, no_optim=True,
                                        device="cpu"))
        sd = export_generator_to_torch(
            {"params": self.params, **self.state}, ref_g.state_dict(),
            g_depth=int(self.config.get("G_depth", 2)))
        torch.save({k: torch.from_numpy(np.asarray(v).copy())
                    for k, v in sd.items()}, out_path)
        return out_path

    def _block_fn(self, events_per_call: int, chunks: int):
        """Cached jitted block generator (see generate_block)."""
        cache = self.__dict__.setdefault("_block_fns", {})
        sig = (events_per_call, chunks)
        if sig in cache:
            return cache[sig]
        es = self.event_size
        dim_z = self.config["dim_z"]
        batch = es * events_per_call
        y = jnp.tile(jnp.arange(es, dtype=jnp.int32), events_per_call)
        module = self.module

        @jax.jit
        def gen_many(params, state, key):
            def body(carry, i):
                k = jax.random.fold_in(key, i)
                kz, kr = jax.random.split(k)
                z = jax.random.normal(kz, (batch, dim_z), jnp.float32)
                imgs = module.apply({"params": params, **state}, z, y,
                                    train=False, rngs={"rdof": kr})
                return carry, generate_postprocess(imgs.astype(jnp.float32))

            _, out = jax.lax.scan(body, 0, jnp.arange(chunks))
            return out.reshape(chunks * batch, *out.shape[2:])

        cache[sig] = gen_many
        return gen_many

    @functools.cached_property
    def _generate_fn(self):
        module = self.module

        @jax.jit
        def fn(params, state, z, y, rng):
            imgs = module.apply({"params": params, **state}, z, y, train=False,
                                rngs={"rdof": rng})
            return generate_postprocess(imgs, threshold=-0.26)
        return fn


def generate_block(model: Model, events_per_call: int, chunks: int,
                   rng: jax.Array) -> jax.Array:
    """Generate chunks*events_per_call events in ONE device dispatch via an
    internal scan — on a network-attached chip, per-dispatch overhead is
    large and dispatches with pending-device args serialize, so production
    throughput comes from amortizing dispatches over big blocks.
    Returns (chunks * events_per_call * event_size, 250, W)."""
    fn = model._block_fn(events_per_call, chunks)
    return fn(model.params, model.state, rng)


def generate_batched(model: Model, events_per_call: int,
                     rng: jax.Array) -> jax.Array:
    """Generate events_per_call events in one device program:
    (events_per_call * event_size, 250, W) ADU images. The batched variant
    of generate() used by the production pipeline (amortizes dispatch and
    fills the MXU)."""
    es = model.event_size
    kz, kr = jax.random.split(rng)
    z = jax.random.normal(kz, (es * events_per_call, model.config["dim_z"]),
                          jnp.float32)
    y = jnp.tile(jnp.arange(es, dtype=jnp.int32), events_per_call)
    return model._generate_fn(model.params, model.state, z, y, kr)


def generate(model: Model, rng: jax.Array | int | None = None) -> np.ndarray:
    """Generate one event: (event_size, 250, 768) float ADU in [0, 255]
    (reference contract: ieagan.py:1343-1366, tests/test_image_gen.py:29-38).
    """
    if rng is None:
        rng = np.random.randint(0, 2 ** 31 - 1)
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    kz, kr = jax.random.split(rng)
    z = jax.random.normal(kz, (model.event_size, model.config["dim_z"]), jnp.float32)
    y = jnp.arange(model.event_size, dtype=jnp.int32)
    imgs = model._generate_fn(model.params, model.state, z, y, kr)
    return np.asarray(imgs)
