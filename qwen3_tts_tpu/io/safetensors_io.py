"""Minimal safetensors reader/writer (numpy-backed, bfloat16-aware).

Replaces the reference's `MLX.loadArrays` checkpoint path
(reference Qwen3TTSPipeline.swift:142, AudioDecoder.swift:141). A small
self-contained implementation is used instead of `safetensors`' numpy API so
that bfloat16 tensors round-trip (numpy has no native bf16; we use ml_dtypes).

Format: 8-byte little-endian header length N, N bytes of JSON
({name: {dtype, shape, data_offsets}}, optional "__metadata__"), then the raw
little-endian tensor buffer.
"""

from __future__ import annotations

import json
import struct
from typing import Mapping

import ml_dtypes
import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": ml_dtypes.bfloat16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "U16": np.uint16,
    "U32": np.uint32,
    "U64": np.uint64,
    "BOOL": np.bool_,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}


def load_header(path: str) -> dict[str, tuple[str, tuple[int, ...]]]:
    """Read only the safetensors header: {name: (dtype_str, shape)}.

    Used by the checkpoint audit tool (io/audit.py) — layout validation never
    needs the tensor bytes."""
    with open(path, "rb") as f:
        header_len = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(header_len).decode("utf-8"))
    return {
        name: (info["dtype"], tuple(info["shape"]))
        for name, info in header.items()
        if name != "__metadata__"
    }


def load_file(path: str) -> dict[str, np.ndarray]:
    """Load all tensors from a .safetensors file as numpy arrays.

    Uses a single memmap; returned arrays are copies (safe to mutate / hand
    to jax.device_put without pinning the file).
    """
    with open(path, "rb") as f:
        header_len = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(header_len).decode("utf-8"))
    data = np.memmap(path, dtype=np.uint8, mode="r", offset=8 + header_len)

    out: dict[str, np.ndarray] = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        dtype = _DTYPES[info["dtype"]]
        shape = tuple(info["shape"])
        start, end = info["data_offsets"]
        buf = np.array(data[start:end])  # copy out of the memmap
        out[name] = buf.view(dtype).reshape(shape)
    del data
    return out


def save_file(tensors: Mapping[str, np.ndarray], path: str) -> None:
    """Write tensors to a .safetensors file (used by tests and converters)."""
    header: dict[str, dict] = {}
    offset = 0
    blobs: list[bytes] = []
    for name in tensors:
        arr = np.ascontiguousarray(tensors[name])
        dt = np.dtype(arr.dtype)
        if dt not in _DTYPE_NAMES:
            raise ValueError(f"unsupported dtype for safetensors: {arr.dtype}")
        blob = arr.tobytes()
        header[name] = {
            "dtype": _DTYPE_NAMES[dt],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(blob)],
        }
        offset += len(blob)
        blobs.append(blob)

    header_bytes = json.dumps(header).encode("utf-8")
    # Pad header to 8-byte alignment (spec recommendation)
    pad = (8 - len(header_bytes) % 8) % 8
    header_bytes += b" " * pad

    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(header_bytes)))
        f.write(header_bytes)
        for blob in blobs:
            f.write(blob)
