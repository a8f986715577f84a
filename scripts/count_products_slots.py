"""How many kernel slots does the products panel layout need at different
dst-tile heights? Decides whether an R_TILE parameter is worth plumbing."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cogdl_tpu.datasets.synthetic import powerlaw_graph_device
from cogdl_tpu.ops.pallas.segment_kernels import BLOCK_CHUNKS, T_CHUNK

g = powerlaw_graph_device(2_450_000, avg_degree=50, feat_dim=8)
E = g.num_edges
row, col = g.row[:E], g.col[:E]
n_pad = g.n_pad
panel_rows = 175_104
n_panels = -(-n_pad // panel_rows)
print("E =", E, "n_pad =", n_pad, "panels =", n_panels)

for r_tile in (128, 256, 512, 1024):
    n_tiles = -(-n_pad // r_tile)

    @jax.jit
    def total(row, col, r_tile=r_tile, n_tiles=n_tiles):
        tile = row // r_tile
        gid = (col // panel_rows) * n_tiles + tile
        counts = jax.ops.segment_sum(jnp.ones_like(gid), gid,
                                     num_segments=n_panels * n_tiles)
        cpg = (counts + T_CHUNK - 1) // T_CHUNK
        per_panel = cpg.reshape(n_panels, n_tiles).sum(axis=1)
        per_panel = per_panel + ((-per_panel) % BLOCK_CHUNKS)
        return per_panel.sum()

    nc = int(total(row, col))
    print(f"R_TILE={r_tile:4d}: {nc} chunks = {nc*T_CHUNK/1e6:.1f}M slots "
          f"({nc*T_CHUNK/E:.2f}x edges)")
