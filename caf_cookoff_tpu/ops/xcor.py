"""FFT cross-correlation with the reference's conventions.

Canonical conventions (Rust path, which the golden tests pin):

* both operands are zero-padded by appending zeros to length ``M >= 2N``
  (``caf_rust/src/caf/mod.rs:79-80``; Go pads the haystack *before* and
  needle *after* instead, ``caf_go/caf.go:102-103`` — an equivalent circular
  rotation of the lag axis that we do NOT follow);
* the result is ``ifft(fft(a) * conj(fft(b)))`` with a single ``1/M``
  normalization (``caf_rust/src/caf/xcor_rustfft.rs:51-78`` divides the
  spectral product by M because RustFFT's inverse is unnormalized — the net
  effect equals numpy's normalized ``ifft``);
* operand order: ``a = haystack``, ``b = shifted needle``
  (``caf_rust/src/caf/mod.rs:139``), so for signals nonzero on ``[0, N)``
  the circular correlation ``r[tau] = sum_s a[s+tau] * conj(b[s])`` puts a
  positive lag D at raw index D — the Rust tests assert
  ``peak index == lag`` directly (``caf_rust/tests/test.rs:29-30``).

Because only positive-lag indices ``tau < N`` are meaningful for the
reference's truncated-haystack workload, rounding ``M`` up from 2N to the
next power of two (for non-pow2 N) leaves those indices unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from caf_cookoff_tpu.config import xcor_length


def pad_to(x: jax.Array, length: int) -> jax.Array:
    """Append zeros along the last axis up to ``length``."""
    pad = length - x.shape[-1]
    if pad < 0:
        raise ValueError(f"cannot pad length {x.shape[-1]} down to {length}")
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths)


def xcor_pair(a: jax.Array, b: jax.Array, length: Optional[int] = None) -> jax.Array:
    """Complex circular cross-correlation of two equal-length 1-D signals.

    ``r[tau] = sum_s a[s+tau] * conj(b[s])`` over a zero-padded length
    (default ``xcor_length(N)``), computed as ``ifft(fft(a)*conj(fft(b)))``.
    """
    if a.shape[-1] != b.shape[-1]:
        raise ValueError(f"length mismatch: {a.shape[-1]} vs {b.shape[-1]}")
    m = length or xcor_length(a.shape[-1])
    fa = jnp.fft.fft(pad_to(a, m), axis=-1)
    fb = jnp.fft.fft(pad_to(b, m), axis=-1)
    return jnp.fft.ifft(fa * jnp.conj(fb), axis=-1)


def xcor(apple: jax.Array, banana: jax.Array) -> jax.Array:
    """Magnitude cross-correlation, Python-reference flavor.

    Parity shim for ``caf_python/caf.py:15-18`` (scipy ``mode='same'``):
    output length N with lag ``tau = N//2 - argmax`` — kept so users of the
    Python reference find the same call. The canonical engines use
    :func:`xcor_pair` (Rust conventions) instead.
    """
    n = apple.shape[-1]
    m = xcor_length(n)
    # Circular correlation r[tau mod m] equals the linear correlation at lag
    # tau for m >= 2N-1; scipy's mode='same' window covers lags
    # i - N//2 for output index i in [0, N).
    circ = jnp.fft.ifft(
        jnp.fft.fft(pad_to(apple, m), axis=-1)
        * jnp.conj(jnp.fft.fft(pad_to(banana, m), axis=-1)),
        axis=-1,
    )
    lags = (jnp.arange(n) - n // 2) % m
    return jnp.abs(circ[..., lags])


def xcor_bank(haystack_spectrum: jax.Array, shifted_padded: jax.Array) -> jax.Array:
    """Batched xcor rows: one haystack spectrum vs K shifted needles.

    ``haystack_spectrum``: (M,) — ``fft(pad(haystack))`` hoisted out of the
    doppler loop. Every reference implementation recomputes this FFT once
    per bin (400x redundantly, see SURVEY §3.1); hoisting it saves a third
    of the FFT work.

    ``shifted_padded``: (K, M) zero-padded shifted needles.

    Returns (K, M) complex correlation rows.
    """
    fs = jnp.fft.fft(shifted_padded, axis=-1)
    return jnp.fft.ifft(haystack_spectrum[None, :] * jnp.conj(fs), axis=-1)
