"""Element-indexed (overlapping-window) BlockSpec helper.

The conv kernels need overlapping input windows (halo quads/rows). Round-3
kernels fetched them with manual `make_async_copy` + immediate `wait`,
which serializes the HBM fetch against compute (measured ~4-6x over the
kernels' matmul floor at the production batch). `pl.Element` block
dimensions express the same overlapping windows directly in a BlockSpec --
the index map returns ELEMENT offsets, windows may overlap -- so Pallas'
standard revolving-buffer pipeline overlaps the fetch with the previous
step's compute.

Constraints (probed on v5e, jax 0.9): every dimension of the spec must be
Element; low/high padding is unsupported ("Low padding not supported yet"),
so arrays are host-padded and offsets stay in range; sublane-dim offsets
and sizes should stay 8-aligned (the usual Mosaic DMA tiling rule).
"""

from __future__ import annotations

from typing import Callable, Sequence

from jax.experimental import pallas as pl
import jax._src.pallas.core as pallas_core


def element_window(
    block_shape: Sequence[int],
    index_map: Callable,
    *,
    memory_space=None,
) -> pl.BlockSpec:
    """BlockSpec with all-Element dims: `index_map` returns element offsets
    (not block indices), and consecutive windows may overlap."""
    dims = tuple(pallas_core.Element(int(b)) for b in block_shape)
    if memory_space is not None:
        return pl.BlockSpec(dims, index_map, memory_space=memory_space)
    return pl.BlockSpec(dims, index_map)
