"""Torch-free reader for PyTorch ``.pt`` files (zip serialization format).

The reference persists every artifact with ``torch.save`` — trained weights
(``s1/model-state-dict.pt``), cached surfaces (``s1/v.pt`` ...), checkpoints
(``r1/best-model-checkpoint-2.pt``) and simulated traces (``figure-*/y*.pt``).
The framework itself is torch-free; this reader unpickles those artifacts
into numpy arrays for parity tests and weight import.

Supports the torch >= 1.6 zipfile format: ``<name>/data.pkl`` pickled with
persistent IDs ``('storage', <StorageType>, key, location, numel)`` whose
bytes live in ``<name>/data/<key>``.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _Storage:
    def __init__(self, data: np.ndarray):
        self.data = data


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None, metadata=None):
    flat = storage.data
    if len(size) == 0:
        return flat[storage_offset].copy()
    return np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * flat.itemsize for s in stride),
    ).copy()


class _StubClass:
    """Catch-all for torch classes we don't model (device, size, ...)."""

    def __init__(self, *a, **k):
        self.args = a

    def __call__(self, *a, **k):
        return self


class _Unpickler(pickle.Unpickler):
    def __init__(self, fh, zf: zipfile.ZipFile, prefix: str):
        super().__init__(fh)
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name in _DTYPES:
            return name  # storage type tag, consumed in persistent_load
        if (module, name) == ("collections", "OrderedDict"):
            return OrderedDict
        if module.startswith("torch"):
            return _StubClass
        return super().find_class(module, name)

    def persistent_load(self, pid):
        kind, storage_type, key, _location, numel = pid
        assert kind == "storage", f"unknown persistent id {pid!r}"
        if not isinstance(storage_type, str):  # torch.float32-style tag
            storage_type = getattr(storage_type, "name", str(storage_type))
        dtype = _DTYPES.get(storage_type.split(".")[-1], None)
        if dtype is None:
            raise ValueError(f"unsupported storage type {storage_type!r}")
        raw = self._zf.read(f"{self._prefix}/data/{key}")
        return _Storage(np.frombuffer(raw, dtype=dtype))


def pt_load(path: str):
    """Load a torch-saved .pt file as nested python/numpy objects."""
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(f"{path}: not a torch zipfile archive")
        prefix = pkl_names[0][: -len("/data.pkl")]
        with zf.open(pkl_names[0]) as fh:
            return _Unpickler(io.BytesIO(fh.read()), zf, prefix).load()


def load_mlp_state_dict(path: str) -> list[tuple[np.ndarray, np.ndarray]]:
    """Read a reference MLP state dict (keys ``net.0.weight``...) into the
    framework's [(W [in,out], b)] layout (torch stores W as [out,in])."""
    sd = pt_load(path)
    idxs = sorted({int(k.split(".")[1]) for k in sd if k.startswith("net.")})
    return [
        (np.ascontiguousarray(sd[f"net.{i}.weight"].T),
         np.asarray(sd[f"net.{i}.bias"]))
        for i in idxs
    ]
