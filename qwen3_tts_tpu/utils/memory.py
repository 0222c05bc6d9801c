"""Resident-memory accounting for param trees with aliased buffers.

The pipeline's default layout shares device buffers between the mega-kernel
subtrees and the jnp "w8r" view entries (ops/quant.py::kernel_w8r_view), so a
naive sum over tree leaves double-counts them; dedupe by the DEVICE BUFFER
identity (device id + data pointer), not Python object id — two distinct
jax.Array objects can alias one buffer (e.g. jit outputs that return the
same operand twice), and one buffer must never be counted twice no matter
how the tree was produced. The reference's analogue is its quantized
resident model (Qwen3TTSPipeline.swift:961-980).
"""

from __future__ import annotations

import jax


def _buffer_keys(leaf) -> list[tuple]:
    """Identity keys + byte sizes for the device buffer(s) backing a leaf.

    jax.Array leaves are keyed per-shard by (device id, unsafe buffer
    pointer) so sharded arrays dedupe at the buffer level; anything without
    a reachable device buffer (numpy, tracers mid-transform) falls back to
    Python object identity, which can only ever over-count, never hide a
    real duplicate.
    """
    if isinstance(leaf, jax.Array):
        try:
            return [
                (s.device.id, s.data.unsafe_buffer_pointer(), s.data.nbytes)
                for s in leaf.addressable_shards
            ]
        except Exception:
            pass
    return [("py", id(leaf), getattr(leaf, "nbytes", 0))]


def resident_bytes(*trees) -> int:
    """Total device bytes across param trees, counting shared (aliased)
    buffers once. None entries are skipped."""
    seen: set[tuple] = set()
    total = 0
    for tree in trees:
        for leaf in jax.tree.leaves(tree):
            if not hasattr(leaf, "nbytes"):
                continue
            for dev, ptr, nbytes in _buffer_keys(leaf):
                key = (dev, ptr)
                if key not in seen:
                    seen.add(key)
                    total += nbytes
    return total
