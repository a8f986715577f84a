"""Multi-host scaffolding: process-group initialisation and DCN×ICI mesh
construction (SURVEY §2.8 — the TPU-native replacement for the reference's
``dist.init_process_group("nccl")`` + DDP spawn, trainer.py:291).

On a TPU pod slice each *host* owns a set of local chips wired by ICI;
hosts talk over DCN. The right mesh layout puts the bandwidth-hungry axis
(graph/tensor parallelism) on ICI within a host's chips and the
gradient-sync axis (data parallelism) across hosts on DCN — collectives
then ride the fast fabric for the per-step traffic and the slow one only
for the once-per-step gradient all-reduce.

This module is exercised in SIMULATION in tests (single process, virtual
CPU devices); on a real pod slice call :func:`initialize_distributed` once
per host before anything touches jax.devices().
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Join the jax multi-host runtime (``jax.distributed.initialize``).

    On TPU pods all three arguments are auto-detected from the TPU metadata
    server, so a bare ``initialize_distributed()`` in every host process is
    enough; GPU/CPU clusters must pass them (reference's NCCL env:
    MASTER_ADDR/RANK/WORLD_SIZE — same information, one call).

    Returns this process's index. Safe to call when already initialised or
    when running single-process (returns 0 without touching the runtime).
    """
    if num_processes in (None, 1) and coordinator_address is None:
        try:
            return jax.process_index()
        except Exception:    # pragma: no cover - uninitialised backends
            return 0
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def make_hybrid_mesh(dcn_axis: str = "data", ici_axes: Tuple[str, ...] =
                     ("graph",), ici_shape: Optional[Tuple[int, ...]] = None,
                     devices=None) -> Mesh:
    """DCN×ICI mesh: leading axis = one slice per host group (DCN), trailing
    axes = each host's local chips (ICI).

    ``ici_shape`` splits the per-host chips over several ICI axes (e.g.
    ``ici_axes=("graph", "model"), ici_shape=(2, 2)`` on 4-chip hosts).
    Uses ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` when
    more than one process is attached; in single-process simulation the
    "hosts" are emulated by folding the device list, so the same mesh
    shapes (and the same collective patterns) compile on N virtual CPU
    devices — how the tests run it.
    """
    devices = list(jax.devices() if devices is None else devices)
    n_proc = getattr(jax, "process_count", lambda: 1)()
    if n_proc > 1:        # real multi-host: one DCN slice per process
        from jax.experimental import mesh_utils

        per_host = len(devices) // n_proc
        ici_shape = ici_shape or (per_host,)
        mesh_devices = mesh_utils.create_hybrid_device_mesh(
            ici_shape, (n_proc,) + (1,) * (len(ici_shape) - 1),
            devices=devices)
        return Mesh(mesh_devices, (dcn_axis,) + tuple(ici_axes))
    # simulation: emulate `hosts × local chips` by folding the device list
    if ici_shape is None:
        ici_shape = (len(devices),)
    ici = int(np.prod(ici_shape))
    hosts = len(devices) // ici
    if hosts * ici != len(devices):
        raise ValueError(
            f"{len(devices)} devices do not fold into hosts x {ici_shape}")
    arr = np.asarray(devices).reshape((hosts,) + tuple(ici_shape))
    return Mesh(arr, (dcn_axis,) + tuple(ici_axes))
