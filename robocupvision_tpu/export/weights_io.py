"""Flat weights.dat export — the external C++ engine's weight contract.

Reference paramSave.py:5-18: every state_dict tensor, concatenated flat in
registration order, written little-endian. We emit float32 (the format the
robot engine reads; the reference's np.empty(0) float64 seed is an accident
its shipped weightsLP/weights.dat does not exhibit), convert tensors back to
torch layouts first, and include BN gamma/beta/running_mean/running_var while
excluding integer step counters. ``skip_classifier`` skips any tensor whose
name contains "classifier" (paramSave.py:12-14).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from robocupvision_tpu.export.torch_io import to_torch_state_dict
from robocupvision_tpu.models.layers import Registry


def save_params(path: str, reg: Registry, params: Dict[str, np.ndarray],
                fname: str = "weights.dat", skip_classifier: bool = False,
                skip_prefixes: Tuple[str, ...] = ()) -> str:
    """``skip_classifier`` replicates the reference's substring test
    (paramSave.py:12 — note it also matches PB_FCN's ``segmenter.classifier``);
    ``skip_prefixes`` is this framework's precise mechanism for excluding an
    unused head (e.g. ``("classifier.",)``) from a deployment dump."""
    os.makedirs(path, exist_ok=True)
    sd = to_torch_state_dict(reg, params, include_counters=False)
    chunks = []
    for name, arr in sd.items():
        if skip_classifier and "classifier" in name:
            print("Classifier module skipped")
            continue
        if any(name.startswith(p) for p in skip_prefixes):
            continue
        chunks.append(np.asarray(arr, dtype=np.float32).reshape(-1))
    flat = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    out = os.path.join(path, fname)
    flat.astype("<f4").tofile(out)
    return out


def load_params_flat(path: str, reg: Registry,
                     skip_classifier: bool = False) -> Dict[str, np.ndarray]:
    """Inverse of save_params: slice the flat stream back into our layouts.

    Auto-detects the element width: the reference's own saveParams seeds its
    concatenation with ``np.empty(0)`` (float64), so every dump the reference
    itself produced — including the shipped weightsLP/weights.dat (742,696
    bytes = 92,837 float64 values, exactly LabelProp(planes=32)'s parameter
    count with no BN step counters) — is little-endian float64, while this
    framework and the robot engine use float32 (paramSave.py:9-18)."""
    from robocupvision_tpu.export.torch_io import from_torch_state_dict

    expected = sum(
        int(np.prod(spec.shape)) for name, spec in reg.specs.items()
        if not (skip_classifier and "classifier" in name))
    if os.path.getsize(path) == expected * 8:
        flat = np.fromfile(path, dtype="<f8").astype(np.float32)
    else:
        flat = np.fromfile(path, dtype="<f4")
    sd: Dict[str, np.ndarray] = {}
    offset = 0
    for name, spec in reg.specs.items():
        if skip_classifier and "classifier" in name:
            continue
        if spec.kind == "conv_w":
            kh, kw, ci, co = spec.shape
            shape = (co, ci, kh, kw)
        elif spec.kind == "tconv_w":
            kh, kw, ci, co = spec.shape
            shape = (ci, co, kh, kw)
        elif spec.kind == "lin_w":
            ci, co = spec.shape
            shape = (co, ci)
        else:
            shape = tuple(spec.shape)
        n = int(np.prod(shape))
        sd[name] = flat[offset:offset + n].reshape(shape)
        offset += n
    if offset != flat.size:
        raise ValueError(f"{path}: consumed {offset} of {flat.size} floats")
    full = from_torch_state_dict(reg, {**sd, **{k: _zeros_like_spec(reg, k)
                                                for k in reg.specs if k not in sd}})
    return full


def _zeros_like_spec(reg: Registry, name: str) -> np.ndarray:
    spec = reg.specs[name]
    if spec.kind == "conv_w":
        kh, kw, ci, co = spec.shape
        return np.zeros((co, ci, kh, kw), np.float32)
    if spec.kind == "tconv_w":
        kh, kw, ci, co = spec.shape
        return np.zeros((ci, co, kh, kw), np.float32)
    if spec.kind == "lin_w":
        ci, co = spec.shape
        return np.zeros((co, ci), np.float32)
    return np.zeros(spec.shape, np.float32)
