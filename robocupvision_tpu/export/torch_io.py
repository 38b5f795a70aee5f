"""Interop with PyTorch checkpoints (.pth state dicts).

The reference ships/consumes ``torch.save(model.state_dict())`` files
(reference train.py:201, trainer.py:310). Our param dicts use the same names
but TPU layouts, so conversion is a pure layout transform:

  conv   torch (out, in, kh, kw)        <-> ours (kh, kw, in, out)
  tconv  torch (in, out, kh, kw)        <-> ours (kh, kw, in, out), spatially
                                             flipped (ready for lhs-dilated conv)
  linear torch (out, in)                <-> ours (in, out)
  bn     identical vectors; torch's ``num_batches_tracked`` is dropped on
         import and synthesized (0) on export.

torch is only needed when these functions are actually called.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from robocupvision_tpu.models.layers import Registry


def from_torch_state_dict(reg: Registry, state: Dict[str, "object"]) -> Dict[str, np.ndarray]:
    """Convert a torch state_dict (tensors or ndarrays) to our param dict."""
    out: Dict[str, np.ndarray] = {}
    for name, spec in reg.specs.items():
        if name not in state:
            raise KeyError(f"missing parameter in checkpoint: {name}")
        t = state[name]
        a = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        a = a.astype(np.float32)
        if spec.kind == "conv_w":
            a = np.transpose(a, (2, 3, 1, 0))
        elif spec.kind == "tconv_w":
            a = np.ascontiguousarray(np.transpose(a[:, :, ::-1, ::-1], (2, 3, 0, 1)))
        elif spec.kind == "lin_w":
            a = np.ascontiguousarray(a.T)
        if tuple(a.shape) != tuple(spec.shape):
            raise ValueError(f"{name}: shape {a.shape} != expected {spec.shape}")
        out[name] = a
    return out


def to_torch_state_dict(reg: Registry, params: Dict[str, "object"],
                        include_counters: bool = True) -> Dict[str, np.ndarray]:
    """Convert our param dict back to torch state_dict layout (as ndarrays)."""
    out: Dict[str, np.ndarray] = {}
    for name, spec in reg.specs.items():
        a = np.asarray(params[name], dtype=np.float32)
        if spec.kind == "conv_w":
            a = np.transpose(a, (3, 2, 0, 1))
        elif spec.kind == "tconv_w":
            a = np.transpose(a, (2, 3, 0, 1))[:, :, ::-1, ::-1]
            a = np.ascontiguousarray(a)
        elif spec.kind == "lin_w":
            a = np.ascontiguousarray(a.T)
        out[name] = a
        if include_counters and spec.kind == "bn_rv":
            base = name[: -len(".running_var")]
            out[base + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)
    return out
