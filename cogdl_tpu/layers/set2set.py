"""Set2Set global pooling — iterative content-based attention readout.

From "Order Matters: Sequence to sequence for sets" (arXiv:1511.06391).
Reference: cogdl/layers/set2set.py:5-63 (torch LSTM + edge_softmax over the
graph-id segment). TPU redesign notes:

- The LSTM is unrolled over ``processing_steps`` (a static, small constant —
  the reference GCC encoder uses 6) as a plain Python loop under jit; every
  iteration is two segment ops + one [B, 2F]x[2F, 4F] matmul, all static
  shapes.
- The LSTM cell is written out explicitly (packed ``w_ih [in, 4H]`` /
  ``w_hh [H, 4H]`` / ``bias [4H]`` with torch's (i, f, g, o) gate order) so a
  torch ``nn.LSTM`` state_dict maps onto the params 1:1 — the parity test
  loads torch weights directly.
- Per-graph softmax is the same ``segment_softmax`` primitive the edge
  attention ops use (segment ids = node→graph assignment instead of
  edge→dst).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import segment as seg


class Set2Set(nn.Module):
    """Returns a ``[num_graphs, 2 * in_features]`` readout.

    Args:
      in_features: node feature width F (output is 2F).
      processing_steps: number of attention iterations T.
      num_layers: stacked LSTM layers (reference GCC uses 3).
    """

    in_features: int
    processing_steps: int = 6
    num_layers: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, graph_id: jnp.ndarray,
                 num_graphs: int) -> jnp.ndarray:
        f = self.in_features
        # Packed LSTM parameters, torch layout: rows of w are input dims,
        # cols are 4H gates in (i, f, g, o) order. Layer 0 input is 2F
        # (q_star); deeper layers consume the H=F hidden of the previous.
        w_ih, w_hh, bias = [], [], []
        for layer in range(self.num_layers):
            in_dim = 2 * f if layer == 0 else f
            w_ih.append(self.param(f"w_ih_l{layer}", nn.initializers.lecun_normal(),
                                   (in_dim, 4 * f)))
            w_hh.append(self.param(f"w_hh_l{layer}",
                                   nn.initializers.orthogonal(), (f, 4 * f)))
            bias.append(self.param(f"b_l{layer}", nn.initializers.zeros,
                                   (4 * f,)))

        b = num_graphs
        h = [jnp.zeros((b, f), x.dtype) for _ in range(self.num_layers)]
        c = [jnp.zeros((b, f), x.dtype) for _ in range(self.num_layers)]
        q_star = jnp.zeros((b, 2 * f), x.dtype)

        for _ in range(self.processing_steps):
            inp = q_star
            for layer in range(self.num_layers):
                gates = inp @ w_ih[layer] + h[layer] @ w_hh[layer] + bias[layer]
                gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
                c[layer] = nn.sigmoid(gf) * c[layer] + nn.sigmoid(gi) * jnp.tanh(gg)
                h[layer] = nn.sigmoid(go) * jnp.tanh(c[layer])
                inp = h[layer]
            q = h[-1]                                           # [B, F]
            # mode="clip": graph_id is in-bounds by construction (repo
            # gather convention — the default mode="fill" emits a validity
            # select over the whole stream on TPU)
            e = jnp.sum(x * jnp.take(q, graph_id, axis=0,
                                     mode="clip"), -1)          # [N]
            a = seg.segment_softmax(e, graph_id, b)             # [N]
            r = seg.segment_sum(a[:, None] * x, graph_id, b)    # [B, F]
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star
