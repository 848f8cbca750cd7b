"""Overlap-save segmented correlation — long-haystack CAF.

The reference cannot search a capture longer than the needle: every impl
truncates the haystack to needle length (``caf_go/main.go:20``,
``caf_rust/tests/test.rs:327``, ``caf_python/caf.py:130``).  This engine
is the sequence-parallel analog the reference lacks (SURVEY §5
"long-context"): the haystack is cut into blocks of ``V`` lags with
``N-1``-sample forward halos, each block is a circular FFT correlation
against the doppler-shifted needle bank, and blocks are stitched into a
``(K, L-N+1)`` linear-correlation surface.

Block math: with FFT size ``M = next_pow2(2N)`` and ``V = M - N`` lags
per block, block ``b`` reads haystack samples ``[bV, bV + V + N - 1)``
(zero-padded at the tail), so circular lag ``i < V`` of the block equals
linear lag ``bV + i`` of the full correlation — no wrap contamination.

The doppler-shifted needle spectra are computed once and reused across
all blocks (the same hoisting the reference misses even for its single
haystack FFT, SURVEY §3.1).  The peak path streams blocks through a
``lax.scan`` so the surface never touches HBM; the time-sharded
multi-chip variant lives in ``parallel/sharded.py`` and reuses
:func:`streaming_peak` per shard after a ``ppermute`` halo exchange.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from caf_cookoff_tpu.config import xcor_length
from caf_cookoff_tpu.ops.peak import CafPeak, find_peak_2d
from caf_cookoff_tpu.ops.shift import shift_bank
from caf_cookoff_tpu.ops.xcor import pad_to


def plan_blocks(needle_len: int, num_lags: int) -> Tuple[int, int, int]:
    """(fft_len M, lags_per_block V, num_blocks B) for a lag count."""
    m = xcor_length(needle_len)
    v = m - needle_len
    b = -(-num_lags // v)
    return m, v, b


def needle_spectra_conj(needle: jax.Array, freqs_hz: jax.Array,
                        sample_rate, fft_len: int) -> jax.Array:
    """conj(FFT(padded shifted needle bank)) — (K, M), computed once."""
    shifted = pad_to(shift_bank(needle, freqs_hz, sample_rate), fft_len)
    return jnp.conj(jnp.fft.fft(shifted, axis=-1))


def _block_rows(hay_padded: jax.Array, s_conj: jax.Array, b: jax.Array,
                v: int, d: int, m: int) -> jax.Array:
    """(K, V) mag^2 rows of block ``b``: local lags [b*V, b*V + V)."""
    blk = jax.lax.dynamic_slice(hay_padded, (b * v,), (d,))
    spec = jnp.fft.fft(pad_to(blk, m))
    rows = jnp.fft.ifft(spec[None, :] * s_conj, axis=-1)[..., :v]
    return rows.real * rows.real + rows.imag * rows.imag


def streaming_peak(s_conj: jax.Array, haystack: jax.Array, needle_len: int,
                   num_lags: int, lag_offset=0,
                   total_lags: Optional[int] = None) -> CafPeak:
    """Scan-over-blocks peak of ``num_lags`` local lags (traceable core).

    ``lag_offset`` (may be traced, e.g. ``axis_index * chunk``) shifts
    local lags to global lag indices; lags at or beyond ``total_lags``
    (global) are masked out so zero-padded tails cannot win.  Returns a
    :class:`CafPeak` with the *global* lag index.
    """
    m, v, nblocks = plan_blocks(needle_len, num_lags)
    d = v + needle_len - 1
    hay = pad_to(haystack, nblocks * v + needle_len - 1)
    real_dtype = jnp.finfo(s_conj.dtype).dtype
    total = total_lags if total_lags is not None else num_lags

    def step(best: CafPeak, b):
        mag2 = _block_rows(hay, s_conj, b, v, d, m)
        tau_global = (jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)
                      + b * v + lag_offset)
        local_ok = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1) + b * v
        mag2 = jnp.where((local_ok < num_lags) & (tau_global < total),
                         mag2, -1.0)
        cand = find_peak_2d(mag2)
        cand = CafPeak(cand.value, cand.freq_idx, cand.lag_idx + b * v)
        take = cand.value > best.value  # strict: earlier block wins ties
        merged = CafPeak(
            value=jnp.where(take, cand.value, best.value),
            freq_idx=jnp.where(take, cand.freq_idx, best.freq_idx),
            lag_idx=jnp.where(take, cand.lag_idx, best.lag_idx),
        )
        return merged, None

    # The scan carry must match the body output's varying-manual-axes
    # when traced inside shard_map; deriving the init from the traced
    # operands (value * 0) inherits the right VMA both in and out of
    # shard_map without naming mesh axes here.
    zero = (jnp.sum(s_conj.real[..., :1, :1]) * 0
            + jnp.sum(hay.real[..., :1]) * 0
            + jnp.asarray(lag_offset, real_dtype) * 0)
    init = CafPeak(value=zero - jnp.inf,
                   freq_idx=zero.astype(jnp.int32),
                   lag_idx=zero.astype(jnp.int32))
    best, _ = jax.lax.scan(step, init, jnp.arange(nblocks))
    return CafPeak(best.value, best.freq_idx,
                   best.lag_idx + jnp.asarray(lag_offset, jnp.int32))


@functools.partial(jax.jit, static_argnames=("num_lags", "needle_len"))
def _os_surface_jit(needle, haystack, freqs_hz, sample_rate, num_lags,
                    needle_len):
    m, v, nblocks = plan_blocks(needle_len, num_lags)
    d = v + needle_len - 1
    s_conj = needle_spectra_conj(needle, freqs_hz, sample_rate, m)
    hay = pad_to(haystack, nblocks * v + needle_len - 1)

    def step(_, b):
        return None, _block_rows(hay, s_conj, b, v, d, m)

    _, blocks = jax.lax.scan(step, None, jnp.arange(nblocks))  # (B, K, V)
    surf = jnp.moveaxis(blocks, 0, 1).reshape(freqs_hz.shape[0],
                                              nblocks * v)
    return surf[:, :num_lags]


@functools.partial(jax.jit, static_argnames=("num_lags", "needle_len"))
def _os_peak_jit(needle, haystack, freqs_hz, sample_rate, num_lags,
                 needle_len):
    m, _, _ = plan_blocks(needle_len, num_lags)
    s_conj = needle_spectra_conj(needle, freqs_hz, sample_rate, m)
    return streaming_peak(s_conj, haystack, needle_len, num_lags)


def _check_lengths(needle, haystack):
    if haystack.shape[-1] < needle.shape[-1]:
        raise ValueError(
            f"haystack ({haystack.shape[-1]}) shorter than needle "
            f"({needle.shape[-1]})")


def overlap_save_surface(needle, haystack, freqs_hz, sample_rate,
                         num_lags: Optional[int] = None) -> jax.Array:
    """(K, num_lags) linear-correlation CAF surface for a long haystack.

    ``num_lags`` defaults to the full-overlap range ``L - N + 1``.
    """
    needle = jnp.asarray(needle)
    haystack = jnp.asarray(haystack)
    freqs_hz = jnp.asarray(freqs_hz)
    _check_lengths(needle, haystack)
    n = needle.shape[-1]
    lags = num_lags or haystack.shape[-1] - n + 1
    return _os_surface_jit(needle, haystack, freqs_hz, float(sample_rate),
                           lags, n)


def overlap_save_peak(needle, haystack, freqs_hz, sample_rate,
                      num_lags: Optional[int] = None
                      ) -> Tuple[float, int, float]:
    """(freq_hz, lag, value) peak of the long-haystack CAF.

    Streams blocks through a ``lax.scan`` — the full surface never
    touches HBM, so arbitrarily long captures run in O(K*M) memory.
    """
    needle = jnp.asarray(needle)
    haystack = jnp.asarray(haystack)
    freqs_hz = jnp.asarray(freqs_hz)
    _check_lengths(needle, haystack)
    n = needle.shape[-1]
    lags = num_lags or haystack.shape[-1] - n + 1
    peak = _os_peak_jit(needle, haystack, freqs_hz, float(sample_rate),
                        lags, n)
    return (float(freqs_hz[int(peak.freq_idx)]), int(peak.lag_idx),
            float(peak.value))
