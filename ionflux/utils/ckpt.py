"""Checkpointing (reference train-r1.py:59-74, 947-959).

Checkpoints are dicts {epoch, params, opt_state, loss} written every
validation interval, plus a best-model copy when the summed validation MAE
improves.  Torch-free format: one .npz of flattened pytree leaves + a JSON
sidecar with metadata; restores exactly (same leaf order via tree structure
of a template).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    leaves = jax.tree.leaves(tree)
    np.savez(path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_pytree(path: str, template):
    data = np.load(path)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    return jax.tree.unflatten(jax.tree.structure(template), leaves)


def save_checkpoint(dirname: str, params, opt_state, epoch: int,
                    val_losses: list[float], suffix: str = "",
                    is_best: bool = False) -> None:
    """checkpoint<suffix>.npz (+ best-model-checkpoint<suffix>.npz on
    improvement), mirroring the reference's naming (train-r1.py:61-66)."""
    os.makedirs(dirname, exist_ok=True)
    base = os.path.join(dirname, f"checkpoint{suffix}")
    save_pytree(base + ".params.npz", params)
    save_pytree(base + ".opt.npz", opt_state)
    with open(base + ".json", "w") as fh:
        json.dump({"epoch": epoch, "loss": list(map(float, val_losses))}, fh)
    if is_best:
        best = os.path.join(dirname, f"best-model-checkpoint{suffix}")
        for ext in (".params.npz", ".opt.npz", ".json"):
            src, dst = base + ext, best + ext
            with open(src, "rb") as s, open(dst, "wb") as d:
                d.write(s.read())


def load_checkpoint(dirname: str, params_template, opt_template=None,
                    suffix: str = "", best: bool = False):
    """Restore (params, opt_state, epoch, loss) (train-r1.py:68-72)."""
    name = ("best-model-checkpoint" if best else "checkpoint") + suffix
    base = os.path.join(dirname, name)
    params = load_pytree(base + ".params.npz", params_template)
    opt_state = (load_pytree(base + ".opt.npz", opt_template)
                 if opt_template is not None else None)
    with open(base + ".json") as fh:
        meta = json.load(fh)
    return params, opt_state, meta["epoch"], meta["loss"]


def _jsonable(v):
    """Best-effort JSON form of a spec field (scalars, tuples, nested
    dataclass-like constants); None for fields with no stable JSON form."""
    if v is None or isinstance(v, (str, int, float, bool)):
        return v
    if isinstance(v, (tuple, list)):
        out = [_jsonable(x) for x in v]
        return out if all(x is not None for x in out) else None
    if hasattr(v, "_asdict"):  # NamedTuple constants (registry params)
        return {k: _jsonable(x) for k, x in v._asdict().items()}
    if hasattr(v, "__dict__") and v.__dict__:
        return {k: _jsonable(x) for k, x in v.__dict__.items()}
    try:
        return float(v)  # numpy host scalars
    except (TypeError, ValueError):
        return None


def save_model_bundle(path: str, params, spec=None) -> None:
    """Self-describing model bundle — the `model-entire.pt` analogue
    (train-s1.py:947-949): one .npz of the params pytree plus a JSON sidecar
    with the study spec (model kind, architecture, nested constants), so a
    model can be reloaded without knowing its construction site.  Fields
    with no JSON form are recorded as null."""
    save_pytree(path, params)
    meta = {}
    if spec is not None:
        for k, v in getattr(spec, "__dict__", {}).items():
            meta[k] = _jsonable(v)
    stem = path[:-4] if path.endswith(".npz") else path
    with open(stem + ".spec.json", "w") as fh:
        json.dump({"params_file": os.path.basename(path), **meta}, fh,
                  indent=1)
