"""Checkpoint I/O.

Native format: compressed .npz of the flat param dict (our TPU layouts) plus
the registry order. Filenames preserve the reference's mangled names
(train/naming.py) including their .weights/.pth suffixes.

``load_any`` also accepts the reference's torch-pickle checkpoints (the files
under /root/reference/pth and the published checkpoints.zip) by falling back
to torch.load + layout conversion — a reference user's existing checkpoints
load directly into this framework.
"""

from __future__ import annotations

import io
import os
from typing import Dict

import numpy as np

from robocupvision_tpu.models.layers import Registry

MAGIC_KEY = "__robocupvision_tpu__"
SLIM_KEY = "__slim__"  # structurally-pruned dict: per-layer widths differ


def save(path: str, reg: Registry, params: Dict[str, "np.ndarray"],
         slim: bool = False) -> None:
    """``slim=True`` marks a structurally-pruned (compacted, ops/slim.py)
    checkpoint whose array shapes legitimately differ from the registry —
    load_any skips shape validation for marked files only."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {name: np.asarray(params[name]) for name in reg.specs}
    arrays[MAGIC_KEY] = np.array(1)
    if slim:
        arrays[SLIM_KEY] = np.array(1)
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def _load_npz(path: str, reg: Registry) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        is_slim = SLIM_KEY in z
        out = {}
        for name, spec in reg.specs.items():
            if name not in z:
                raise KeyError(f"{path}: missing {name}")
            a = z[name]
            if not is_slim and tuple(a.shape) != tuple(spec.shape):
                raise ValueError(f"{path}: {name} shape {a.shape} != {spec.shape}")
            out[name] = a.astype(np.float32)
        return out


def load_any(path: str, reg: Registry) -> Dict[str, np.ndarray]:
    """Load a checkpoint: our .npz format or a torch pickle from the reference."""
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] == b"PK":  # zip: either our npz or a torch>=1.6 zipfile pickle
        is_ours = False
        try:
            with np.load(path, allow_pickle=False) as z:
                is_ours = MAGIC_KEY in z
        except Exception:
            pass
        if is_ours:
            # our own format: surface shape/name mismatches directly instead
            # of falling through to a confusing torch unpickling error
            return _load_npz(path, reg)
        try:
            return _load_npz(path, reg)
        except Exception:
            pass
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    from robocupvision_tpu.export.torch_io import from_torch_state_dict

    return from_torch_state_dict(reg, state)


def exists(path: str) -> bool:
    return os.path.exists(path)


# ---- crash-resume state (framework extension) -------------------------------
#
# The reference's "resume" is warm-starting the next pipeline stage from the
# best weights (SURVEY §5) — no optimizer state, no step counter. The chunked
# fused train loop (Trainer.train_run) extends that to TRUE crash resume: the
# full TrainState (params + optax state), the on-device best carry, the rng,
# and the chunk cursor are written after every chunk; a killed run restarted
# with --resume continues bit-identically (pinned by
# tests/test_train_pipeline.py::test_train_run_resume_matches_uninterrupted).


def save_resume(path: str, params: Dict[str, np.ndarray], opt_leaves,
                best_score: float, best_params: Dict[str, np.ndarray],
                rng: np.ndarray, next_chunk: int, meta: Dict) -> None:
    """Atomically write a resume snapshot (tmp file + rename: a crash during
    the write leaves the previous snapshot intact)."""
    import json

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {f"p_{k}": np.asarray(v) for k, v in params.items()}
    arrays.update({f"b_{k}": np.asarray(v) for k, v in best_params.items()})
    arrays.update({f"o_{i}": np.asarray(v) for i, v in enumerate(opt_leaves)})
    arrays["rng"] = np.asarray(rng)
    arrays["best_score"] = np.float32(best_score)
    arrays["next_chunk"] = np.int64(next_chunk)
    arrays["meta"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8).copy()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)


def load_resume(path: str):
    """-> (params, opt_leaves, best_score, best_params, rng, next_chunk,
    meta)."""
    import json

    with np.load(path, allow_pickle=False) as z:
        params = {k[2:]: z[k] for k in z.files if k.startswith("p_")}
        best_params = {k[2:]: z[k] for k in z.files if k.startswith("b_")}
        n_opt = sum(1 for k in z.files if k.startswith("o_"))
        opt_leaves = [z[f"o_{i}"] for i in range(n_opt)]
        meta = json.loads(bytes(z["meta"]).decode())
        return (params, opt_leaves, float(z["best_score"]), best_params,
                z["rng"], int(z["next_chunk"]), meta)
