"""Ultralytics → Flax weight port for the YOLOv8 detector.

Maps a torch ``state_dict`` with ultralytics' ``model.model.{i}.*`` naming onto
the module tree of :class:`wtracker_tpu.models.yolov8.YoloV8`, so the
reference's custom-trained ``yolov8s_trained.pt`` (yolo_controller.py:27) runs
on TPU unchanged.  Convolution kernels transpose OIHW → HWIO (NHWC layout);
BatchNorm splits into params (scale/bias) and batch_stats (mean/var).

The port is validated in tests against an independent torch implementation of
the same public architecture with random weights (the reference's trained
weights are git-LFS blobs absent from the mount, .MISSING_LARGE_BLOBS:6-7).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# our module name ← ultralytics layer index
LAYER_MAP = {
    "b0": 0,
    "b1": 1,
    "b2": 2,
    "b3": 3,
    "b4": 4,
    "b5": 5,
    "b6": 6,
    "b7": 7,
    "b8": 8,
    "b9": 9,
    "n12": 12,
    "n15": 15,
    "n16": 16,
    "n18": 18,
    "n19": 19,
    "n21": 21,
}
HEAD_LAYER = 22


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW → flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _port_convbn(sd: dict, prefix: str) -> tuple[dict, dict]:
    params = {
        "conv": {"kernel": _conv_kernel(sd[f"{prefix}.conv.weight"])},
        "bn": {
            "scale": np.asarray(sd[f"{prefix}.bn.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bn.bias"]),
        },
    }
    stats = {
        "bn": {
            "mean": np.asarray(sd[f"{prefix}.bn.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.bn.running_var"]),
        }
    }
    return params, stats


def _port_bottleneck(sd: dict, prefix: str) -> tuple[dict, dict]:
    p1, s1 = _port_convbn(sd, f"{prefix}.cv1")
    p2, s2 = _port_convbn(sd, f"{prefix}.cv2")
    return {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2}


def _port_c2f(sd: dict, prefix: str) -> tuple[dict, dict]:
    params, stats = {}, {}
    for name in ("cv1", "cv2"):
        params[name], stats[name] = _port_convbn(sd, f"{prefix}.{name}")
    i = 0
    while f"{prefix}.m.{i}.cv1.conv.weight" in sd:
        params[f"m_{i}"], stats[f"m_{i}"] = _port_bottleneck(sd, f"{prefix}.m.{i}")
        i += 1
    return params, stats


def _port_plain_conv(sd: dict, prefix: str) -> dict:
    out = {"kernel": _conv_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def port_state_dict(sd: dict, prefix: str = "model.") -> dict[str, Any]:
    """Convert an ultralytics state dict to Flax ``{"params", "batch_stats"}``.

    Args:
        sd: mapping of parameter name → numpy array.
        prefix: leading name component before the layer index ("model." for a
            bare DetectionModel, "model.model." inside a full YOLO pickle).
    """
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    for ours, idx in LAYER_MAP.items():
        base = f"{prefix}{idx}"
        if f"{base}.conv.weight" in sd:  # plain ConvBN layer
            params[ours], stats[ours] = _port_convbn(sd, base)
        else:  # C2f or SPPF — both expose cv1/cv2 (+ optional m.{i})
            params[ours], stats[ours] = _port_c2f(sd, base)

    head_p: dict[str, Any] = {}
    head_s: dict[str, Any] = {}
    base = f"{prefix}{HEAD_LAYER}"
    for i in range(3):
        for branch in ("cv2", "cv3"):
            for j in (0, 1):
                p, s = _port_convbn(sd, f"{base}.{branch}.{i}.{j}")
                head_p[f"{branch}_{i}_{j}"] = p
                head_s[f"{branch}_{i}_{j}"] = s
            head_p[f"{branch}_{i}_2"] = _port_plain_conv(sd, f"{base}.{branch}.{i}.2")
    params["head"] = head_p
    stats["head"] = head_s

    return {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }


# ---------------------------------------------------------------------------
# the inverse port: Flax → ultralytics state-dict layout (for interop export)
# ---------------------------------------------------------------------------


def _export_kernel(k: np.ndarray) -> np.ndarray:
    """flax HWIO → torch OIHW."""
    return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def _export_convbn(out: dict, prefix: str, p: dict, s: dict) -> None:
    out[f"{prefix}.conv.weight"] = _export_kernel(p["conv"]["kernel"])
    out[f"{prefix}.bn.weight"] = np.asarray(p["bn"]["scale"])
    out[f"{prefix}.bn.bias"] = np.asarray(p["bn"]["bias"])
    out[f"{prefix}.bn.running_mean"] = np.asarray(s["bn"]["mean"])
    out[f"{prefix}.bn.running_var"] = np.asarray(s["bn"]["var"])
    out[f"{prefix}.bn.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def export_state_dict(variables: dict, prefix: str = "model.", reg_max: int = 16) -> dict[str, np.ndarray]:
    """Convert Flax ``{"params", "batch_stats"}`` to the ultralytics
    ``model.{i}.*`` state-dict layout (the exact inverse of
    :func:`port_state_dict`) so natively-trained detectors flow back to the
    reference toolchain (yolo_training.ipynb exports its weights for reuse).

    Requires the *unfused* variables (BN still separate); raises otherwise.
    The fixed DFL expectation conv (which our decode computes arithmetically)
    is materialized as ``arange(reg_max)`` to complete the manifest.
    """
    params = variables["params"]
    stats = variables.get("batch_stats")
    if not stats:
        raise ValueError(
            "export needs unfused variables with batch_stats — export before "
            "fuse_conv_bn(), or retrain/load the unfused form"
        )
    out: dict[str, np.ndarray] = {}

    def walk(p: dict, s: dict, prefix_t: str) -> None:
        if "conv" in p and "bn" in p:
            _export_convbn(out, prefix_t, p, s)
            return
        for name in sorted(p):
            tname = name.replace("m_", "m.") if name.startswith("m_") else name
            walk(p[name], s.get(name, {}), f"{prefix_t}.{tname}")

    for ours, idx in LAYER_MAP.items():
        walk(params[ours], stats[ours], f"{prefix}{idx}")

    base = f"{prefix}{HEAD_LAYER}"
    for i in range(3):
        for branch in ("cv2", "cv3"):
            for j in (0, 1):
                p = params["head"][f"{branch}_{i}_{j}"]
                s = stats["head"][f"{branch}_{i}_{j}"]
                _export_convbn(out, f"{base}.{branch}.{i}.{j}", p, s)
            p2 = params["head"][f"{branch}_{i}_2"]
            out[f"{base}.{branch}.{i}.2.weight"] = _export_kernel(p2["kernel"])
            out[f"{base}.{branch}.{i}.2.bias"] = np.asarray(p2["bias"])
    out[f"{base}.dfl.conv.weight"] = np.arange(reg_max, dtype=np.float32).reshape(1, reg_max, 1, 1)
    return out


def save_torch_state_dict(detector, path: str, prefix: str = "model.") -> None:
    """Export a detector's weights as a torch ``state_dict`` file in the
    ultralytics naming layout (loadable with ``torch.load`` + the reference's
    YOLO tooling)."""
    import torch

    sd = export_state_dict(detector.variables, prefix=prefix, reg_max=detector.model.reg_max)
    torch.save({k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}, path)


def load_ultralytics_checkpoint(path: str, imgsz=(384, 384), conf: float = 0.1):
    """Load an ultralytics .pt checkpoint into a :class:`YoloV8Detector`.

    Handles both raw ``state_dict`` saves and full-model pickles (the latter
    need the ultralytics package importable to unpickle).
    """
    import torch

    from wtracker_tpu.models.yolov8 import SCALES, YoloV8, YoloV8Detector

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        sd = {k: v.detach().numpy() for k, v in obj.state_dict().items()}
    elif isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "state_dict"):
        sd = {k: v.detach().float().numpy() for k, v in obj["model"].state_dict().items()}
    else:
        sd = {k: np.asarray(v) for k, v in obj.items()}

    # normalize prefix to "model.{i}."
    if any(k.startswith("model.model.") for k in sd):
        prefix = "model.model."
    else:
        prefix = "model."

    variables = port_state_dict(sd, prefix=prefix)

    # infer nc and scale from shapes
    nc = variables["params"]["head"]["cv3_0_2"]["kernel"].shape[-1]
    stem_out = variables["params"]["b0"]["conv"]["kernel"].shape[-1]
    scale = next(s for s, (_, w, _) in SCALES.items() if round(64 * w) == stem_out or max(round(64 * w), 16) == stem_out)

    model = YoloV8(nc=nc, scale=scale)
    return YoloV8Detector(model=model, variables=variables, imgsz=imgsz, conf=conf)
