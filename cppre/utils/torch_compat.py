"""Import reference torch FNO checkpoints into cppre flax params.

The reference trains `FNO_multi1d` / `FNO_multi2d`
(`/root/reference/Other_UQ/Bayesian_Models/Base_FNO.py:124-208,286-354`;
the same classes appear in every experiment directory) and saves
`state_dict()` files with `torch.save`. A user migrating to cppre can load
such a checkpoint directly into `cppre.models.FNO1d/FNO2d`:

    template = model.init(jax.random.PRNGKey(0), x0)
    params = load_torch_fno("FNO_Wave_run1.pth", template)
    pred = model.apply(params, x)

The mapping is the inverse of the one `tests/test_fno_torch_parity.py`
pins at float32 tolerance:

    fc{0,1,2}_time.weight  [out, in]        -> Dense kernel  [in, out] (T)
    f{i}.conv.weights{1,2} cfloat           -> weights{1,2}_re / _im
    f{i}.mlp.mlp{1,2}      Conv [o,i,1,...] -> _ChannelMLP_0/Dense_{0,1}
    f{i}.w                 Conv [o,i,1,...] -> _Channel1x1_0/Dense_0
    f{i}.b                 Conv [o,i,1,...] -> _Channel1x1_1/Dense_0
"""

from __future__ import annotations

import numpy as np

__all__ = ["fno_params_from_torch", "load_torch_fno"]

_BLOCKS = ("f0", "f1", "f2", "f3", "f4", "f5")


def _to_np(v):
    """torch.Tensor (incl. cfloat) or array-like -> numpy array."""
    if hasattr(v, "detach"):
        v = v.detach().cpu()
        if hasattr(v, "resolve_conj"):
            v = v.resolve_conj()
        return v.numpy()
    return np.asarray(v)


def _take(sd: dict, key: str):
    if key in sd:
        return _to_np(sd[key])
    if "module." + key in sd:  # DataParallel-wrapped checkpoints
        return _to_np(sd["module." + key])
    raise KeyError(
        f"torch state_dict is missing '{key}' — expected a reference "
        f"FNO_multi1d/2d state_dict (Base_FNO.py naming: fc0_time, f0..f5, "
        f"fc1_time, fc2_time). Got keys like: {sorted(sd)[:6]}")


def _dense(sd, name):
    """nn.Linear -> flax Dense {kernel [in, out], bias}."""
    return {"kernel": _take(sd, f"{name}.weight").T.copy(),
            "bias": _take(sd, f"{name}.bias").copy()}


def _conv1x1(sd, name):
    """nn.Conv{2,3}d with 1x1(x1) kernels -> flax Dense over channels."""
    w = _take(sd, f"{name}.weight")
    w = w.reshape(w.shape[0], w.shape[1])  # [out, in, 1, ...] -> [out, in]
    return {"kernel": w.T.copy(), "bias": _take(sd, f"{name}.bias").copy()}


def _spectral(sd, name, n_weights: int):
    """SpectralConv cfloat weights -> split re/im leaves."""
    out = {}
    for k in range(1, n_weights + 1):
        w = _take(sd, f"{name}.weights{k}")
        out[f"weights{k}_re"] = np.ascontiguousarray(w.real)
        out[f"weights{k}_im"] = np.ascontiguousarray(w.imag)
    return out


def fno_params_from_torch(state_dict: dict, template) -> dict:
    """Convert a reference `FNO_multi1d/2d` torch state_dict into the flax
    variables pytree of `cppre.models.FNO1d/FNO2d`.

    `template` is the pytree from `model.init(...)` (either the full
    variables dict or its "params" sub-tree); it supplies the expected
    structure and shapes, which are validated leaf-by-leaf.
    """
    wrapped = isinstance(template, dict) and set(template) == {"params"}
    tp = template["params"] if wrapped else template

    spectral_name = next(k for k in tp["f0"] if k.startswith("SpectralConv"))
    n_weights = 2 if "weights2_re" in tp["f0"][spectral_name] else 1

    params = {"fc0_time": _dense(state_dict, "fc0_time"),
              "fc1_time": _dense(state_dict, "fc1_time"),
              "fc2_time": _dense(state_dict, "fc2_time")}
    for blk in _BLOCKS:
        params[blk] = {
            spectral_name: _spectral(state_dict, f"{blk}.conv", n_weights),
            "_ChannelMLP_0": {
                "Dense_0": _conv1x1(state_dict, f"{blk}.mlp.mlp1"),
                "Dense_1": _conv1x1(state_dict, f"{blk}.mlp.mlp2"),
            },
            "_Channel1x1_0": {"Dense_0": _conv1x1(state_dict, f"{blk}.w")},
            "_Channel1x1_1": {"Dense_0": _conv1x1(state_dict, f"{blk}.b")},
        }

    import jax
    import jax.numpy as jnp

    flat_t = jax.tree_util.tree_leaves_with_path(tp)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(params))
    out_flat = {}
    for path, leaf in flat_t:
        if path not in flat_p:
            raise ValueError(f"no torch weight mapped onto template leaf "
                             f"{jax.tree_util.keystr(path)}")
        got = flat_p[path]
        if tuple(got.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(path)}: torch "
                f"{tuple(got.shape)} vs template {tuple(leaf.shape)} — "
                f"was the torch model built with the same "
                f"T_in/step/modes/num_vars/width_time?")
        out_flat[path] = jnp.asarray(got, leaf.dtype)
    extra = set(flat_p) - {p for p, _ in flat_t}
    if extra:
        raise ValueError(f"torch checkpoint leaves with no template "
                         f"counterpart: {sorted(map(str, extra))[:4]}")
    out = jax.tree_util.tree_map_with_path(lambda p, _: out_flat[p], tp)
    return {"params": out} if wrapped else out


def load_torch_fno(path: str, template) -> dict:
    """`torch.load` a reference FNO checkpoint file and convert it (see
    `fno_params_from_torch`). Accepts a raw state_dict file or a dict
    holding one under a 'model'/'state_dict' key."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # torch raises UnpicklingError subtypes here
        # weights_only=True refuses pickled nn.Module objects (whole-model
        # saves); loading them would execute arbitrary pickle code, so we
        # don't fall back — tell the user how to convert instead
        raise ValueError(
            f"{path!r} is not a plain state_dict checkpoint (torch "
            f"weights_only load failed: {e}). If it is a whole-model "
            f"`torch.save(model)` file, re-save it as "
            f"`torch.save(model.state_dict(), ...)` in an environment "
            f"that trusts the file, then retry.") from e
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj and not hasattr(
                obj[key], "detach"):
            obj = obj[key]
    return fno_params_from_torch(obj, template)
