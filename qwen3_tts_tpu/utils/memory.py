"""Resident-memory accounting for param trees with aliased buffers.

The pipeline's default layout shares device buffers between the mega-kernel
subtrees and the jnp "w8r" view entries (ops/quant.py::kernel_w8r_view), so a
naive sum over tree leaves double-counts them; dedupe by buffer identity.
The reference's analogue is its quantized resident model
(Qwen3TTSPipeline.swift:961-980).
"""

from __future__ import annotations

import jax


def resident_bytes(*trees) -> int:
    """Total device bytes across param trees, counting shared (aliased)
    buffers once. None entries are skipped."""
    seen: set[int] = set()
    total = 0
    for tree in trees:
        for leaf in jax.tree.leaves(tree):
            if hasattr(leaf, "nbytes") and id(leaf) not in seen:
                seen.add(id(leaf))
                total += leaf.nbytes
    return total
