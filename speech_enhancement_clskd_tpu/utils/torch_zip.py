"""Pure-Python reader for PyTorch zip-format checkpoints (``torch.save``).

Lets the framework load the reference's shipped weights
(``checkpoint/the_best_model.pth``, written by reference ``distill.py:280-294``
in asteroid's publishable-bundle schema) **without importing torch**: the
checkpoint is a zip archive holding ``<name>/data.pkl`` (a pickle whose tensors
are persistent-id references) plus one raw little-endian buffer per storage
under ``<name>/data/<key>``.

Only what ``torch.save`` emits for plain ``state_dict``-style payloads is
supported: tensors (any dtype/shape/stride), dicts/lists/tuples/scalars, and a
few harmless torch metadata globals which are decoded to plain Python values.
Anything else raises, by design (this is a reader, not an unpickler for
arbitrary code).
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # decoded specially below
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StorageRef:
    __slots__ = ("dtype_name", "key")

    def __init__(self, dtype_name: str, key: str):
        self.dtype_name = dtype_name
        self.key = key


class _TorchVersion(str):
    """Stands in for torch.torch_version.TorchVersion (a str subclass)."""


class _DtypeStub:
    def __init__(self, name):
        self.name = name

    def __repr__(self):
        return self.name


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad,
                       backward_hooks, *extra):
    arr, dtype = storage
    if dtype is None:  # bfloat16: widen to float32
        raw = arr.view(np.uint16).astype(np.uint32) << 16
        arr = raw.view(np.float32)
        itemsize = 4
    else:
        itemsize = arr.dtype.itemsize
    if not size:
        return arr[storage_offset : storage_offset + 1].reshape(())
    strides_bytes = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=tuple(size), strides=strides_bytes
    )
    return np.ascontiguousarray(view)


_SAFE_REDUCERS = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): lambda data, requires_grad, hooks: data,
    ("collections", "OrderedDict"): __import__("collections").OrderedDict,
    ("torch.torch_version", "TorchVersion"): _TorchVersion,
    ("torch.serialization", "_get_layout"): lambda name: name,
}


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if (module, name) in _SAFE_REDUCERS:
            return _SAFE_REDUCERS[(module, name)]
        if module == "torch" and name.endswith("Storage"):
            return _DtypeStub(name)
        if module == "torch" and name in ("float32", "float64", "bfloat16"):
            return _DtypeStub(name)
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} (not tensor data)"
        )

    def persistent_load(self, pid):
        kind, storage_type, key, _location, _numel = pid
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {kind!r}")
        name = getattr(storage_type, "name", str(storage_type))
        if name not in _DTYPES:
            raise pickle.UnpicklingError(f"unsupported storage {name}")
        raw = self._zf.read(f"{self._prefix}/data/{key}")
        np_dtype = _DTYPES[name]
        if np_dtype is None:  # bfloat16 raw
            return np.frombuffer(raw, dtype=np.uint16), None
        arr = np.frombuffer(raw, dtype=np_dtype)
        return arr, np_dtype


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a torch zip checkpoint into plain Python + numpy arrays."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl")]
        if not pkl:
            raise ValueError(f"{path}: not a torch zip checkpoint")
        prefix = pkl[0].rsplit("/", 1)[0]
        data = zf.read(pkl[0])
        obj = _Unpickler(io.BytesIO(data), zf, prefix).load()
    return obj
