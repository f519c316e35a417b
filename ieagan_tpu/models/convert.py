"""Torch -> flax Generator weight conversion.

Converts a reference-layout PyTorch Generator state dict (reference:
model.py:139-487 — BigGAN-deep G with SN convs/linears, ccbn gain/bias
linears, shared embedding, optional RRM) into this framework's
{params, spectral, batch_stats} collections, so upstream-trained
checkpoints run natively and model-level parity can be asserted.

Layout mapping:
  * torch Linear weight (out, in)        -> kernel (in, out)      [transpose]
  * torch Conv2d weight (O, I, kh, kw)   -> kernel (kh, kw, I, O)
  * torch Embedding weight (n, d)        -> embedding (n, d)
  * SN u0 buffers (1, out)               -> spectral ... u (num_svs, out)
    (the flattened fan-in order differs between frameworks, but u lives in
    the output space and v/sv are recomputed from W Wᵀ, which is
    flattening-invariant — the normalized weight is identical)
  * ccbn stored_mean/stored_var          -> batch_stats ... mean/var
  * torch blocks ModuleList index k      -> blocks_{k // depth}_{k % depth}
    (the reference nests one GBlock per inner list; stage attention at
    inner index 1 of the stage-final list)
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


def _rrm_path(prefix: str, rest: list[str]) -> list[str]:
    """RRM submodule path rewrite shared by all four converters:
    layers.i -> layers_i; linear_net.{0,3} -> linear{1,2}."""
    out = [prefix]
    i = 0
    while i < len(rest):
        p = rest[i]
        if p == "layers":
            out.append(f"layers_{rest[i + 1]}")
            i += 2
        elif p == "linear_net":
            out.append({"0": "linear1", "3": "linear2"}[rest[i + 1]])
            i += 2
        else:
            out.append(p)
            i += 1
    return out


def _put(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_torch_generator(state_dict: dict, g_depth: int = 2) -> dict:
    """Return {"params": ..., "spectral": ..., "batch_stats": ...} for
    Generator.apply from a torch state dict (tensors or arrays)."""
    params: dict = {}
    spectral: dict = {}
    batch_stats: dict = {}

    def arr(v):
        return np.asarray(getattr(v, "detach", lambda: v)().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    def module_path(parts: list[str]) -> list[str]:
        # torch 'blocks.k.j.rest' -> ours 'blocks_{k//depth}_{k%depth}' (+ rest)
        if parts[0] == "blocks":
            k, j = int(parts[1]), int(parts[2])
            name = f"blocks_{k // g_depth}_{k % g_depth}"
            if j > 0:
                name = f"attn_{k // g_depth}"  # stage-final attention
            return [name] + parts[3:]
        if parts[0] == "output_layer":
            return (["output_bn"] if parts[1] == "0" else ["output_conv"]) \
                + parts[2:]
        if parts[0] == "RR_G":
            return _rrm_path("RR_G", parts[1:])
        return parts

    for key, val in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        path = module_path(parts[:-1])
        v = arr(val)
        if leaf == "weight":
            if v.ndim == 4:  # conv (O, I, kh, kw) -> (kh, kw, I, O)
                _put(params, path + ["kernel"], v.transpose(2, 3, 1, 0))
            elif v.ndim == 2:
                if path and path[-1] == "shared" or parts[0] == "shared":
                    _put(params, path + ["embedding"], v)
                elif path and ("norm" in path[-1]):
                    _put(params, path + ["scale"], v)
                else:  # linear (out, in) -> (in, out)
                    _put(params, path + ["kernel"], v.T)
            else:  # 1-D: LayerNorm weight
                _put(params, path + ["scale"], v)
        elif leaf == "bias":
            _put(params, path + ["bias"], v)
        elif leaf == "gain":
            _put(params, path + ["gain"], v)
        elif leaf.startswith("u") and leaf[1:].isdigit():
            _put(spectral, path + ["u"], v.reshape(1, -1))
        elif leaf.startswith("sv") and leaf[2:].isdigit():
            _put(spectral, path + ["sv"], v.reshape(-1))
        elif leaf == "stored_mean":
            _put(batch_stats, path + ["mean"], v)
        elif leaf == "stored_var":
            _put(batch_stats, path + ["var"], v)
        elif leaf == "gamma":
            _put(params, path + ["gamma"], np.float32(v))
        # accumulation counters etc. keep defaults

    # torch `bn` modules store learned gain/bias as Parameters named
    # gain/bias at the module level — our BatchNorm uses the same names;
    # torch ccbn gain/bias are sub-Linears handled by the rules above.
    _fix_output_bn(params, batch_stats)
    return {"params": params, "spectral": spectral,
            "batch_stats": batch_stats}


def _fix_output_bn(params: dict, batch_stats: dict):
    ob = params.get("output_bn")
    if not isinstance(ob, dict):
        return
    # nothing to fix when gain/bias already flat arrays
    for name in ("gain", "bias"):
        v = ob.get(name)
        if isinstance(v, dict):  # unexpected nesting
            ob[name] = next(iter(v.values()))


def convert_torch_discriminator(state_dict: dict, d_depth: int = 2) -> dict:
    """Convert a reference-layout PyTorch Discriminator state dict
    (reference: model.py:624-944) — torch nests D_depth DBlocks per stage
    list (attention appended at inner index D_depth), versus the G's
    one-block-per-list layout."""
    params: dict = {}
    spectral: dict = {}

    def arr(v):
        return np.asarray(getattr(v, "detach", lambda: v)().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    def module_path(parts: list[str]) -> list[str]:
        if parts[0] == "blocks":
            stage, j = int(parts[1]), int(parts[2])
            name = (f"blocks_{stage}_{j}" if j < d_depth else f"attn_{stage}")
            return [name] + parts[3:]
        if parts[0] in ("RR_D", "RR_Dproxy"):
            return _rrm_path(parts[0], parts[1:])
        return parts

    for key, val in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        path = module_path(parts[:-1])
        v = arr(val)
        if leaf == "weight":
            if v.ndim == 4:
                _put(params, path + ["kernel"], v.transpose(2, 3, 1, 0))
            elif v.ndim == 2:
                if parts[0] == "embed":
                    _put(params, path + ["embedding"], v)
                else:
                    _put(params, path + ["kernel"], v.T)
            else:  # LayerNorm weight
                _put(params, path + ["scale"], v)
        elif leaf == "bias":
            _put(params, path + ["bias"], v)
        elif leaf.startswith("u") and leaf[1:].isdigit():
            _put(spectral, path + ["u"], v.reshape(1, -1))
        elif leaf.startswith("sv") and leaf[2:].isdigit():
            _put(spectral, path + ["sv"], v.reshape(-1))
        elif leaf == "gamma":
            _put(params, path + ["gamma"], np.float32(v))
    return {"params": params, "spectral": spectral}


def _get(tree: Any, path: list[str]):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def export_generator_to_torch(variables: dict, template_state_dict: dict,
                              g_depth: int = 2) -> dict:
    """Inverse of convert_torch_generator: produce a reference-layout torch
    Generator state dict (numpy arrays) from our flax variables, so models
    trained in this framework can be loaded by the reference implementation
    (reference: model.py:139-487) — e.g. for metric cross-validation or for
    users migrating back.

    Template-driven: every key of `template_state_dict` (an initialized
    reference Generator's state_dict) is filled from the flax tree via the
    same path mapping as the forward converter; keys with no flax
    counterpart (accumulation counters) keep their template values."""
    params = variables.get("params", {})
    spectral = variables.get("spectral", {})
    batch_stats = variables.get("batch_stats", {})

    def module_path(parts: list[str]) -> list[str]:
        if parts[0] == "blocks":
            k, j = int(parts[1]), int(parts[2])
            name = f"blocks_{k // g_depth}_{k % g_depth}"
            if j > 0:
                name = f"attn_{k // g_depth}"
            return [name] + parts[3:]
        if parts[0] == "output_layer":
            return (["output_bn"] if parts[1] == "0" else ["output_conv"]) \
                + parts[2:]
        if parts[0] == "RR_G":
            return _rrm_path("RR_G", parts[1:])
        return parts

    out_sd: dict = {}
    for key, tmpl in template_state_dict.items():
        tshape = tuple(getattr(tmpl, "shape", ()))
        parts = key.split(".")
        leaf = parts[-1]
        path = module_path(parts[:-1])
        v = None
        if leaf == "weight":
            if len(tshape) == 4:
                k = _get(params, path + ["kernel"])
                v = None if k is None else np.asarray(k).transpose(3, 2, 0, 1)
            elif (path and path[-1] == "shared") or parts[0] == "shared":
                v = _get(params, path + ["embedding"])
            else:
                k = _get(params, path + ["kernel"])
                if k is not None:
                    v = np.asarray(k).T
                else:  # LayerNorm / norm scale
                    v = _get(params, path + ["scale"])
        elif leaf == "bias":
            v = _get(params, path + ["bias"])
        elif leaf == "gain":
            v = _get(params, path + ["gain"])
        elif leaf.startswith("u") and leaf[1:].isdigit():
            u = _get(spectral, path + ["u"])
            if u is not None:
                v = np.asarray(u)[int(leaf[1:])]
        elif leaf.startswith("sv") and leaf[2:].isdigit():
            sv = _get(spectral, path + ["sv"])
            if sv is not None:
                v = np.asarray(sv).reshape(-1)[int(leaf[2:])]
        elif leaf == "stored_mean":
            v = _get(batch_stats, path + ["mean"])
        elif leaf == "stored_var":
            v = _get(batch_stats, path + ["var"])
        elif leaf == "gamma":
            v = _get(params, path + ["gamma"])
        if v is None:
            out_sd[key] = np.asarray(tmpl)  # counters etc.: keep defaults
        else:
            out_sd[key] = np.asarray(v, np.float32).reshape(tshape)
    return out_sd


def export_discriminator_to_torch(variables: dict,
                                  template_state_dict: dict,
                                  d_depth: int = 2) -> dict:
    """Inverse of convert_torch_discriminator (reference layout:
    model.py:624-944): template-driven like export_generator_to_torch."""
    params = variables.get("params", {})
    spectral = variables.get("spectral", {})

    def module_path(parts: list[str]) -> list[str]:
        if parts[0] == "blocks":
            stage, j = int(parts[1]), int(parts[2])
            name = (f"blocks_{stage}_{j}" if j < d_depth else f"attn_{stage}")
            return [name] + parts[3:]
        if parts[0] in ("RR_D", "RR_Dproxy"):
            return _rrm_path(parts[0], parts[1:])
        return parts

    out_sd: dict = {}
    for key, tmpl in template_state_dict.items():
        tshape = tuple(getattr(tmpl, "shape", ()))
        parts = key.split(".")
        leaf = parts[-1]
        path = module_path(parts[:-1])
        v = None
        if leaf == "weight":
            if len(tshape) == 4:
                k = _get(params, path + ["kernel"])
                v = None if k is None else np.asarray(k).transpose(3, 2, 0, 1)
            elif parts[0] == "embed":
                v = _get(params, path + ["embedding"])
            else:
                k = _get(params, path + ["kernel"])
                if k is not None:
                    v = np.asarray(k).T
                else:
                    v = _get(params, path + ["scale"])
        elif leaf == "bias":
            v = _get(params, path + ["bias"])
        elif leaf.startswith("u") and leaf[1:].isdigit():
            u = _get(spectral, path + ["u"])
            if u is not None:
                v = np.asarray(u)[int(leaf[1:])]
        elif leaf.startswith("sv") and leaf[2:].isdigit():
            sv = _get(spectral, path + ["sv"])
            if sv is not None:
                v = np.asarray(sv).reshape(-1)[int(leaf[2:])]
        elif leaf == "gamma":
            v = _get(params, path + ["gamma"])
        if v is None:
            out_sd[key] = np.asarray(tmpl)
        else:
            out_sd[key] = np.asarray(v, np.float32).reshape(tshape)
    return out_sd


def load_into_variables(variables: dict, converted: dict) -> dict:
    """Overlay converted arrays onto an initialized variables tree (keeps
    any leaves the conversion does not cover, e.g. sv logging buffers and
    accumulation counters). Shapes must match where both sides exist."""
    def merge(base, conv):
        if not isinstance(base, dict):
            if conv is None:
                return base
            b = np.asarray(base)
            c = np.asarray(conv, b.dtype)
            assert c.shape == b.shape, f"shape mismatch {c.shape} vs {b.shape}"
            return c
        return {k: merge(v, conv.get(k) if isinstance(conv, dict) else None)
                for k, v in base.items()}

    return {col: merge(tree, converted.get(col, {}))
            for col, tree in variables.items()}


# ---------------------------------------------------------------------------
# Optimizer-moment interop (mid-training migration both directions).
#
# The reference checkpoints G_optim/D_optim as torch Adam state dicts
# (reference: utils/__init__.py:689-726 save/load of `.optim.state_dict()`),
# keyed by parameter INDEX in `model.parameters()` order — which is the
# state-dict key order restricted to trainable parameters (buffers like
# u0/sv0/stored_mean/stored_var are registered after the parameters of each
# module and are excluded). Adam moments are elementwise, so they follow
# exactly the same path mapping + reshapes as the weights themselves: the
# exporters below reuse the template-driven weight converters verbatim with
# the moment trees standing in for `params`.
# ---------------------------------------------------------------------------

_TORCH_BUFFER_RE = re.compile(
    r"\.(u\d+|sv\d+|stored_mean|stored_var|accumulation_counter|"
    r"num_batches_tracked)$")


def torch_param_names(template_state_dict: dict) -> list[str]:
    """Ordered trainable-parameter keys of a reference state dict — the
    torch optimizer's param indexing order (state-dict order minus
    buffers)."""
    return [k for k in template_state_dict if not _TORCH_BUFFER_RE.search(k)]


def _find_adam_state(opt_state):
    """Locate the single ScaleByAdamState (count/mu/nu) in an optax state
    pytree (plain `optax.adam`, possibly inside a clip chain)."""
    found = []

    def walk(s):
        if hasattr(s, "mu") and hasattr(s, "nu") and hasattr(s, "count"):
            found.append(s)
            return
        if isinstance(s, (tuple, list)):
            for c in s:
                walk(c)

    walk(opt_state)
    if len(found) != 1:
        raise ValueError(
            f"expected exactly one Adam moment state, found {len(found)} "
            "(amsgrad/adabelief moment interop is not supported)")
    return found[0]


def export_adam_to_torch(opt_state, template_state_dict: dict,
                         which: str = "G", depth: int = 2) -> dict:
    """Export an optax Adam state to a reference-layout torch
    ``optim.state_dict()`` (numpy arrays), so a training run migrating back
    to the reference keeps its moments (reference: utils/__init__.py:705)."""
    adam = _find_adam_state(opt_state)
    exporter = (export_generator_to_torch if which == "G"
                else export_discriminator_to_torch)
    names = torch_param_names(template_state_dict)
    tmpl = {k: np.zeros_like(np.asarray(template_state_dict[k]))
            for k in names}
    import jax
    as_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
    avg = exporter({"params": as_np(adam.mu)}, tmpl, depth)
    sq = exporter({"params": as_np(adam.nu)}, tmpl, depth)
    step = int(np.asarray(adam.count))
    return {
        "state": {i: {"step": step,
                      "exp_avg": avg[k], "exp_avg_sq": sq[k]}
                  for i, k in enumerate(names)},
        "param_groups": [{"params": list(range(len(names)))}],
    }


def convert_torch_adam(optim_state_dict: dict, template_state_dict: dict,
                       params_template, opt_state,
                       which: str = "G", depth: int = 2):
    """Inverse: fill an optax Adam state's mu/nu from a reference torch
    Adam ``state_dict()``. Params the torch state lacks (lazily
    uninitialized) keep zero moments. Returns a new opt_state pytree."""
    import jax

    converter = (convert_torch_generator if which == "G"
                 else convert_torch_discriminator)
    names = torch_param_names(template_state_dict)
    state = {int(k): v for k, v in optim_state_dict["state"].items()}

    def moment_tree(field):
        sd = {names[i]: st[field] for i, st in state.items()
              if field in st and i < len(names)}
        conv = converter(sd, depth)["params"]

        def overlay(base, sub):
            if not isinstance(base, dict):
                if sub is None:
                    return np.zeros_like(np.asarray(base))
                v = np.asarray(sub, np.float32)
                b = np.asarray(base)
                assert v.shape == b.shape, \
                    f"moment shape mismatch {v.shape} vs {b.shape}"
                return v
            return {k: overlay(val, sub.get(k)
                               if isinstance(sub, dict) else None)
                    for k, val in base.items()}

        return overlay(params_template, conv)

    mu = moment_tree("exp_avg")
    nu = moment_tree("exp_avg_sq")
    steps = [int(np.asarray(st["step"]).max()) for st in state.values()
             if "step" in st]
    count = np.int32(max(steps) if steps else 0)

    adam = _find_adam_state(opt_state)

    def replace(s):
        if s is adam:
            return s._replace(count=count, mu=mu, nu=nu)
        if isinstance(s, tuple) and not hasattr(s, "_replace"):
            return tuple(replace(c) for c in s)
        if hasattr(s, "_replace") and not (hasattr(s, "mu")
                                           and hasattr(s, "nu")):
            # other namedtuple states (EmptyState etc.) pass through
            return s
        if isinstance(s, list):
            return [replace(c) for c in s]
        return s

    return replace(opt_state)
