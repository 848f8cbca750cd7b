"""Collective peak reduction.

The reference gathers per-bin rows through in-process channels and scans
them on one thread (`caf_rust/src/caf/mod.rs:31-42` over rows received at
:367-372; `caf_go/caf.go:154-158` drains a buffered chan).  The TPU-native
equivalent reduces ``(value, freq_idx, lag_idx)`` triples across mesh axes
with XLA collectives — no host gather, no surface materialization on one
chip.

Reduction strategy: ``pmax`` on the value, then hierarchical ``pmin``
tie-breaks on (freq_idx, lag_idx) among max-holding shards — the
deterministic "first maximum in row-major order wins" semantics of the
reference's serial scans, without any index flattening that could
overflow int32 at pod-scale surface sizes.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

from caf_cookoff_tpu.ops.peak import CafPeak, merge_peaks

_AxisNames = Union[str, Sequence[str]]

_INT_MAX = jnp.iinfo(jnp.int32).max


def global_peak(local: CafPeak, axis_names: _AxisNames) -> CafPeak:
    """Reduce per-shard peak triples to the replicated global peak.

    Must be called inside ``shard_map``.  ``local`` carries *global*
    indices (the caller offsets them by ``axis_index * shard_extent``).
    """
    value = jnp.asarray(local.value)
    freq_idx = local.freq_idx.astype(jnp.int32)
    lag_idx = local.lag_idx.astype(jnp.int32)

    m = jax.lax.pmax(value, axis_names)
    is_max = value >= m
    f_min = jax.lax.pmin(jnp.where(is_max, freq_idx, _INT_MAX), axis_names)
    l_min = jax.lax.pmin(
        jnp.where(is_max & (freq_idx == f_min), lag_idx, _INT_MAX),
        axis_names)
    return CafPeak(value=m, freq_idx=f_min, lag_idx=l_min)


def global_peaks(local: CafPeak, axis_names: _AxisNames, num_peaks: int,
                 exclude_freq: int, exclude_lag: int) -> CafPeak:
    """Reduce per-shard top-``num_peaks`` lattices to the global lattice.

    Must be called inside ``shard_map``; ``local``'s fields are
    ``(num_peaks,)`` with *global* indices, empty slots ``-inf``.  The
    candidate lattices ``all_gather`` over the reduction axes (3 tiny
    ``N*P`` vectors — far cheaper than any surface traffic) and every
    shard runs the same deterministic NMS merge, so the result is
    replicated by construction.  Cross-shard NMS is what makes this
    more than a concatenate: an emitter whose mainlobe straddles a
    time-shard boundary is detected by both neighbors and must collapse
    to one entry.
    """
    names = [axis_names] if isinstance(axis_names, str) else list(axis_names)
    value = jnp.asarray(local.value)
    freq_idx = local.freq_idx.astype(jnp.int32)
    lag_idx = local.lag_idx.astype(jnp.int32)
    for name in names:
        value = jax.lax.all_gather(value, name, tiled=True)
        freq_idx = jax.lax.all_gather(freq_idx, name, tiled=True)
        lag_idx = jax.lax.all_gather(lag_idx, name, tiled=True)
    return merge_peaks(CafPeak(value, freq_idx, lag_idx), num_peaks,
                       exclude_freq, exclude_lag)
