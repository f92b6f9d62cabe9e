"""Flax ResMLP worm-movement predictor + torch checkpoint port.

Capability parity with the reference ``wtracker/neural/mlp.py`` —
``WormPredictor`` (31-48), ``MLPLayer`` (51-89), ``MlpBlock`` (92-141) and
``RMLP`` (144-188): residual MLP with an optional input layer, ``n_blocks``
blocks applied as ``x = x + block(x)``, and a linear head.  Each layer is
Dense → BatchNorm → activation (BatchNorm skipped when the activation is
``none``, matching mlp.py:68-70).

``load_torch_checkpoint`` ports the reference's shipped ``ResMLP(...).pt``
whole-module pickles (saved via ``torch.save(self.model)``,
training.py:119-128) into Flax parameter pytrees, so the stock predictors run
on TPU unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from wtracker_tpu.neural.config import IOConfig

ACTIVATIONS: dict[str | None, Callable] = {
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "softmax": nn.softmax,
    "logsoftmax": nn.log_softmax,
    "lrelu": nn.leaky_relu,
    "none": lambda x: x,
    None: lambda x: x,
}


class MLPLayer(nn.Module):
    """Dense → BatchNorm → activation (BatchNorm only with a real activation)."""

    out_dim: int
    nonlin: str | None = "relu"
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.out_dim, name="dense", dtype=x.dtype)(x)
        if self.batch_norm and self.nonlin not in ("none", None):
            # torch BatchNorm1d defaults: eps 1e-5, momentum 0.1 (=1-0.9)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn", dtype=x.dtype
            )(x)
        return ACTIVATIONS[self.nonlin](x)


class MlpBlock(nn.Module):
    """A stack of :class:`MLPLayer`s over ``dims`` with matching ``nonlins``."""

    dims: Sequence[int]
    nonlins: Sequence[str | None]
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert len(self.nonlins) == len(self.dims)
        for i, out_dim in enumerate(self.dims):
            x = MLPLayer(out_dim, self.nonlins[i], self.batch_norm, name=f"layer_{i}")(x, train=train)
        return x


class RMLP(nn.Module):
    """Residual MLP: optional input layer, residual blocks, linear head."""

    block_in_dim: int
    block_dims: Sequence[int]
    block_nonlins: Sequence[str | None]
    n_blocks: int
    out_dim: int
    in_dim: int | None = None  # when set, a first projection layer is added
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.reshape(x.shape[0], -1)
        if self.in_dim is not None:
            x = MLPLayer(self.block_in_dim, self.block_nonlins[0], self.batch_norm, name="input")(
                x, train=train
            )
        for i in range(self.n_blocks):
            out = MlpBlock(self.block_dims, self.block_nonlins, self.batch_norm, name=f"block_{i}")(
                x, train=train
            )
            x = x + out
        return nn.Dense(self.out_dim, name="output", dtype=x.dtype)(x)


@dataclass
class WormPredictor:
    """A trained movement-prediction model bound to its IO contract.

    Wraps a Flax module + variables with the :class:`IOConfig` describing which
    frame offsets feed the model and which it predicts (mirroring the reference
    ``WormPredictor``, mlp.py:31-48).  Calling it runs jitted inference with
    frozen batch statistics.
    """

    model: nn.Module
    variables: dict[str, Any]
    io_config: IOConfig
    _infer: Callable = field(init=False, repr=False, default=None)

    def __post_init__(self):
        model = self.model

        @jax.jit
        def infer(variables, x):
            return model.apply(variables, x, train=False)

        object.__setattr__(self, "_infer", infer)

    def __call__(self, x) -> jnp.ndarray:
        """Inference on a batch shaped (N, in_dim) → (N, out_dim)."""
        return self._infer(self.variables, jnp.asarray(x, dtype=jnp.float32))

    forward = __call__

    def print_model(self) -> None:
        print(self.model)


def make_rmlp_predictor(
    io_config: IOConfig,
    block_in_dim: int = 40,
    block_dims: Sequence[int] = (10, 4, 10, 40),
    n_blocks: int = 4,
    nonlin: str = "relu",
    batch_norm: bool = True,
    seed: int = 0,
) -> WormPredictor:
    """Fresh (untrained) predictor with the reference's default topology."""
    model = RMLP(
        block_in_dim=block_in_dim,
        block_dims=tuple(block_dims),
        block_nonlins=(nonlin,) * len(block_dims),
        n_blocks=n_blocks,
        out_dim=io_config.out_dim,
        in_dim=io_config.in_dim,
        batch_norm=batch_norm,
    )
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, io_config.in_dim), jnp.float32), train=False)
    return WormPredictor(model=model, variables=variables, io_config=io_config)


# ---------------------------------------------------------------------------
# persistence (.npz)
# ---------------------------------------------------------------------------


def _flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        out.update(_flatten(v, key)) if isinstance(v, dict) else out.update({key: np.asarray(v)})
    return out


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for key, v in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return out


def save_predictor(predictor: WormPredictor, path: str) -> None:
    """Persist a predictor (topology + weights + IO contract) to ``.npz``."""
    m = predictor.model
    meta = dict(
        block_in_dim=m.block_in_dim,
        block_dims=list(m.block_dims),
        block_nonlins=list(m.block_nonlins),
        n_blocks=m.n_blocks,
        out_dim=m.out_dim,
        in_dim=m.in_dim,
        batch_norm=m.batch_norm,
        input_frames=list(predictor.io_config.input_frames),
        pred_frames=list(predictor.io_config.pred_frames),
    )
    flat = _flatten(jax.tree.map(np.asarray, predictor.variables))
    flat["__meta__"] = np.array(meta, dtype=object)
    np.savez(path, **flat)


def load_predictor(path: str) -> WormPredictor:
    """Load a predictor saved by :func:`save_predictor`."""
    data = np.load(path, allow_pickle=True)
    meta = data["__meta__"].item()
    variables = _unflatten({k: data[k] for k in data.files if k != "__meta__"})
    model = RMLP(
        block_in_dim=meta["block_in_dim"],
        block_dims=tuple(meta["block_dims"]),
        block_nonlins=tuple(meta["block_nonlins"]),
        n_blocks=meta["n_blocks"],
        out_dim=meta["out_dim"],
        in_dim=meta["in_dim"],
        batch_norm=meta["batch_norm"],
    )
    io_config = IOConfig(list(meta["input_frames"]), list(meta["pred_frames"]))
    return WormPredictor(model=model, variables=variables, io_config=io_config)


# ---------------------------------------------------------------------------
# torch checkpoint port
# ---------------------------------------------------------------------------


def _port_mlp_layer(prefix: str, sd: dict, has_bn: bool) -> dict:
    """Convert one torch MLPLayer (`<prefix>.mlp_layer.{0,1}`) to Flax params."""
    out: dict[str, Any] = {
        "dense": {
            "kernel": np.ascontiguousarray(sd[f"{prefix}.mlp_layer.0.weight"].T),
            "bias": np.asarray(sd[f"{prefix}.mlp_layer.0.bias"]),
        }
    }
    if has_bn:
        out["bn"] = {
            "scale": np.asarray(sd[f"{prefix}.mlp_layer.1.weight"]),
            "bias": np.asarray(sd[f"{prefix}.mlp_layer.1.bias"]),
        }
    return out


def _port_mlp_layer_stats(prefix: str, sd: dict) -> dict:
    return {
        "bn": {
            "mean": np.asarray(sd[f"{prefix}.mlp_layer.1.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.mlp_layer.1.running_var"]),
        }
    }


def load_torch_checkpoint(path: str, reference_root: str | None = None) -> WormPredictor:
    """Load a reference ``WormPredictor`` .pt pickle and port it to Flax.

    Args:
        path: the ``.pt`` file (a whole-module pickle of the torch model).
        reference_root: directory containing the original ``wtracker`` package,
            needed to unpickle the module classes (read-only).
    """
    import os
    import sys

    import torch

    if reference_root is None:
        # whole-module pickles reference the upstream ``wtracker`` package;
        # find it next to the checkpoint (e.g. <root>/models/x.pt -> <root>)
        parent = os.path.dirname(os.path.abspath(path))
        while parent != os.path.dirname(parent):
            if os.path.isdir(os.path.join(parent, "wtracker", "neural")):
                reference_root = parent
                break
            parent = os.path.dirname(parent)
    if reference_root and reference_root not in sys.path:
        sys.path.insert(0, reference_root)

    tm = torch.load(path, map_location="cpu", weights_only=False)
    io = tm.io_config
    io_config = IOConfig(list(io.input_frames), list(io.pred_frames))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    # Recover the topology from the pickled module structure.
    rmlp = tm.model
    has_input = f"model.input.mlp_layer.0.weight" in sd
    n_blocks = len(rmlp.blocks)
    block_dims = [layer.mlp_layer[0].out_features for layer in rmlp.blocks[0].sequence]
    block_in_dim = rmlp.blocks[0].sequence[0].mlp_layer[0].in_features
    in_dim = rmlp.input.mlp_layer[0].in_features if has_input else None
    out_dim = rmlp.output.out_features
    has_bn = any(".mlp_layer.1.running_mean" in k for k in sd)

    model = RMLP(
        block_in_dim=block_in_dim,
        block_dims=tuple(block_dims),
        block_nonlins=("relu",) * len(block_dims),
        n_blocks=n_blocks,
        out_dim=out_dim,
        in_dim=in_dim,
        batch_norm=has_bn,
    )

    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    if has_input:
        params["input"] = _port_mlp_layer("model.input", sd, has_bn)
        if has_bn:
            stats["input"] = _port_mlp_layer_stats("model.input", sd)
    for b in range(n_blocks):
        blk_p: dict[str, Any] = {}
        blk_s: dict[str, Any] = {}
        for i in range(len(block_dims)):
            prefix = f"model.blocks.{b}.sequence.{i}"
            blk_p[f"layer_{i}"] = _port_mlp_layer(prefix, sd, has_bn)
            if has_bn:
                blk_s[f"layer_{i}"] = _port_mlp_layer_stats(prefix, sd)
        params[f"block_{b}"] = blk_p
        if has_bn:
            stats[f"block_{b}"] = blk_s
    params["output"] = {
        "kernel": np.ascontiguousarray(sd["model.output.weight"].T),
        "bias": np.asarray(sd["model.output.bias"]),
    }

    variables = {"params": jax.tree.map(jnp.asarray, params)}
    if has_bn:
        variables["batch_stats"] = jax.tree.map(jnp.asarray, stats)
    return WormPredictor(model=model, variables=variables, io_config=io_config)
