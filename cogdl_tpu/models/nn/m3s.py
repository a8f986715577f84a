"""M3S — multi-stage self-supervised GCN with clustering-based pseudo-labels
(reference cogdl/models/nn/m3s.py + m3s_mw.py:12-50). The model is a GCN; the
multi-stage KMeans label-expansion lives in the wrapper's pre_stage hook."""

from __future__ import annotations

from .gcn import GCN


class M3S(GCN):
    """GCN backbone; stage logic in wrappers (pre_stage pseudo-labels)."""
