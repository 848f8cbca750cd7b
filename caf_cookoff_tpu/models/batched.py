"""Batched pair engine — many (needle, haystack) pairs in one program.

The reference processes exactly one pair per run (its unit of work,
``caf_python/caf.py:89-108``; each main hardcodes one file pair).  Here a
(B, N) batch runs as one jitted program with the doppler bank shared
across pairs — BASELINE config 2 (64 pairs x 400x8192, one chip).  For
multi-chip batches see :func:`caf_cookoff_tpu.parallel.batched_caf_peak`
(pair + doppler mesh sharding).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from caf_cookoff_tpu.config import default_backend, xcor_length
from caf_cookoff_tpu.models.filterbank import _surface_rows_split
from caf_cookoff_tpu.ops import splitfft
from caf_cookoff_tpu.ops.peak import find_peak_2d


@functools.partial(jax.jit, static_argnames=("xcor_len", "backend"))
def _batched_surface_jit(ns_re, ns_im, hs_re, hs_im, freqs_hz, sample_rate,
                         xcor_len, backend):
    return jax.vmap(
        lambda nr, ni, hr, hi: splitfft.mag2(_surface_rows_split(
            (nr, ni), (hr, hi), freqs_hz, sample_rate, xcor_len, backend))
    )(ns_re, ns_im, hs_re, hs_im)


@functools.partial(
    jax.jit, static_argnames=("xcor_len", "backend", "chunk"))
def _batched_peak_jit(ns_re, ns_im, hs_re, hs_im, freqs_hz, sample_rate,
                      xcor_len, backend, chunk: int = 4):
    """Per-pair peaks with bounded memory.

    A flat vmap over B pairs materializes B x (K, M) intermediates —
    ~26 MB per pair per stage at the reference shape, which blows HBM
    locality past a handful of pairs (measured 3x slower per surface at
    B=64).  Instead ``lax.map`` walks chunks of ``chunk`` vmapped pairs:
    constant memory, full per-chunk parallelism.
    """
    b = ns_re.shape[0]
    chunk = min(chunk, b)
    if b % chunk:
        chunk = 1

    def do_chunk(args):
        cr, ci, hr, hi = args
        mag2 = jax.vmap(
            lambda nr, ni, h_r, h_i: splitfft.mag2(_surface_rows_split(
                (nr, ni), (h_r, h_i), freqs_hz, sample_rate, xcor_len,
                backend))
        )(cr, ci, hr, hi)
        return find_peak_2d(mag2)

    def regroup(x):
        return x.reshape(b // chunk, chunk, *x.shape[1:])

    peaks = jax.lax.map(
        do_chunk, tuple(regroup(x) for x in (ns_re, ns_im, hs_re, hs_im)))
    return jax.tree.map(lambda x: x.reshape(b, *x.shape[2:]), peaks)


def _split_batch(needles, haystacks, freqs_hz):
    needles = np.asarray(needles)
    haystacks = np.asarray(haystacks)
    if needles.ndim != 2 or haystacks.shape != needles.shape:
        raise ValueError(
            f"need matching (B, N) batches, got {needles.shape} vs "
            f"{haystacks.shape}")
    ns = splitfft.split_array(needles)
    hs = splitfft.split_array(haystacks)
    return ns, hs, np.asarray(freqs_hz, dtype=ns[0].dtype)


def batched_caf_surface(needles, haystacks, freqs_hz, sample_rate, *,
                        backend: Optional[str] = None) -> jax.Array:
    """(B, K, M) mag^2 surfaces for a (B, N) batch of pairs."""
    backend = backend or default_backend()
    (ns_re, ns_im), (hs_re, hs_im), freqs = _split_batch(
        needles, haystacks, freqs_hz)
    return _batched_surface_jit(ns_re, ns_im, hs_re, hs_im,
                                jnp.asarray(freqs), float(sample_rate),
                                xcor_length(ns_re.shape[-1]), backend)


def batched_caf_peak(needles, haystacks, freqs_hz, sample_rate, *,
                     backend: Optional[str] = None
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-pair peaks: (freqs_hz (B,), lag_idx (B,), value (B,))."""
    backend = backend or default_backend()
    (ns_re, ns_im), (hs_re, hs_im), freqs = _split_batch(
        needles, haystacks, freqs_hz)
    peak = _batched_peak_jit(ns_re, ns_im, hs_re, hs_im,
                             jnp.asarray(freqs), float(sample_rate),
                             xcor_length(ns_re.shape[-1]), backend)
    return (freqs[np.asarray(peak.freq_idx)], np.asarray(peak.lag_idx),
            np.asarray(peak.value))
