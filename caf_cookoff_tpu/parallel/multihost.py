"""Multi-host initialization.

The reference has no multi-node story at all (SURVEY §2.4: in-process
channels only).  Here, scaling past one host is the standard JAX
recipe: every host calls :func:`initialize_cluster`, builds the same
global mesh over ``jax.devices()`` (all chips of all hosts), and feeds
the sharded engines — XLA routes doppler/pair-axis collectives over ICI
within a slice and DCN across hosts.  Keep the ``time`` axis (halo
ppermute traffic) within a slice.

Typical pod-scale run (BASELINE config 5):

    from caf_cookoff_tpu.parallel import multihost, make_mesh, sharded_overlap_save_peak
    multihost.initialize_cluster()                 # on every host
    mesh = multihost.global_mesh(pair=8, doppler=4)
    peak = sharded_overlap_save_peak(needle, capture, freqs, fs, mesh)
"""

from __future__ import annotations

from typing import Optional

import jax

from caf_cookoff_tpu.parallel.mesh import make_mesh


def initialize_cluster(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` with env autodetection.

    On managed TPU pods every argument autodetects; pass explicit values
    for manual clusters.  Safe to call once per process, before any JAX
    computation.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(pair: int = 1, doppler: Optional[int] = None,
                time: int = 1):
    """Mesh over ALL hosts' devices; ``doppler`` defaults to the rest."""
    n = len(jax.devices())
    if doppler is None:
        if n % (pair * time):
            raise ValueError(
                f"{n} devices not divisible by pair*time = {pair * time}")
        doppler = n // (pair * time)
    return make_mesh(pair=pair, doppler=doppler, time=time)


def process_info() -> str:
    """One-line cluster summary for logs."""
    return (f"process {jax.process_index()}/{jax.process_count()}, "
            f"{len(jax.local_devices())} local / "
            f"{len(jax.devices())} global devices")
