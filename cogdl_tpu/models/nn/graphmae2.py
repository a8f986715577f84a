"""GraphMAE2 — masked autoencoding with latent-target regularisation and
multi-remask decoding (reference examples/graphmae2/models/edcoder.py:232
mask_attr_prediction).

On top of GraphMAE's masked-feature reconstruction: (a) a BYOL-style latent
loss — the student's projected+predicted representation of the KEPT nodes
chases an EMA teacher encoder+projector run on the unmasked graph
(edcoder.py:240-262, ema_update:284); (b) the decoder input is re-masked
``num_remasking`` times with a decoder mask token and every reconstruction's
scaled-cosine error on the originally-masked nodes is summed
(random_remask:348). The EMA teacher pytree rides the Trainer's model_state
exactly like BGRL's."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNLayer


def sce_loss(pred, target, gamma: float):
    """Scaled cosine error (reference models/loss_func.py sce_loss)."""
    def norm(v):
        return v * jax.lax.rsqrt(jnp.sum(v ** 2, -1, keepdims=True) + 1e-12)
    return (1.0 - jnp.sum(norm(pred) * norm(target), -1)) ** gamma


class _Projector(nn.Module):
    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mid)(x)
        x = nn.PReLU()(x)
        return nn.Dense(self.out)(x)


class _Predictor(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out)(nn.PReLU()(x))


class GM2Encoder(nn.Module):
    hidden_size: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        g = sym_norm(graph)
        for i in range(self.num_layers):
            x = GCNLayer(self.hidden_size, activation="prelu",
                         name=f"gcn{i}")(g, x, training)
        return x


class GraphMAE2(nn.Module):
    in_features: int
    out_features: int = 0
    hidden_size: int = 256
    num_layers: int = 2
    mask_rate: float = 0.5
    remask_rate: float = 0.5
    num_remasking: int = 3
    gamma: float = 2.0
    lam: float = 1.0            # latent-loss weight (reference lam)

    def setup(self):
        self.enc = GM2Encoder(self.hidden_size, self.num_layers, name="enc")
        self.proj = _Projector(256, self.hidden_size, name="proj")
        self.pred = _Predictor(self.hidden_size, name="pred")
        self.dec = GCNLayer(self.in_features, name="dec")
        self.enc2dec = nn.Dense(self.hidden_size, use_bias=False,
                                name="enc2dec")
        self.mask_token = self.param("mask_token", nn.initializers.zeros,
                                     (1, self.in_features))
        self.dec_mask_token = self.param(
            "dec_mask_token", nn.initializers.zeros, (1, self.hidden_size))

    def encode(self, graph: Graph, x, training: bool = False):
        return self.enc(graph, x, training)

    def teacher_latent(self, graph: Graph, x):
        """EMA branch: encoder → projector on the UNMASKED inputs (only the
        enc/proj subtrees are read — the wrapper passes the teacher pytree)."""
        return self.proj(self.enc(graph, x, False))

    def student_latent(self, h):
        return self.pred(self.proj(h))

    def mask_inputs(self, x, node_mask, rng):
        mask = jax.random.bernoulli(rng, self.mask_rate, (x.shape[0], 1))
        mask = mask & node_mask[:, None]
        return jnp.where(mask, self.mask_token, x), mask

    def remask_decode(self, graph: Graph, h, mask, rng, training: bool):
        """Re-mask the latent ``num_remasking`` times with the decoder mask
        token; sum the SCE of each decode on the originally-masked nodes."""
        g = sym_norm(graph)
        h = self.enc2dec(h)
        x = graph.x
        m = mask.squeeze(-1).astype(jnp.float32)
        total = 0.0
        for i in range(self.num_remasking):
            # an INDEPENDENT random remask per decode (reference
            # random_remask:348 — originally-masked nodes keep their latent)
            rm = jax.random.bernoulli(
                jax.random.fold_in(rng, i), self.remask_rate,
                (h.shape[0], 1))
            rep = jnp.where(rm, self.dec_mask_token, h)
            rec = self.dec(g, rep, training)
            per = sce_loss(rec, x, self.gamma)
            total = total + jnp.sum(per * m) / jnp.maximum(m.sum(), 1.0)
        return total

    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        return self.encode(graph, x, training)

    def embed(self, graph: Graph, x: Optional[jnp.ndarray] = None):
        if x is None:
            x = graph.x
        return self.encode(graph, x, False)

    def init_all(self, graph: Graph, x, rng):
        """Init path touching every submodule."""
        xm, mask = self.mask_inputs(x, graph.node_mask(), rng)
        h = self.encode(graph, xm, False)
        lat = self.student_latent(h)
        tgt = self.teacher_latent(graph, x)
        rec = self.remask_decode(graph, h, mask, rng, False)
        return lat, tgt, rec
