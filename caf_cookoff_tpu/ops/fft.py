"""FFT backends.

The reference races four FFT libraries (FFTW via C, RustFFT, go-dsp,
scipy/pocketfft — SURVEY §2.2). The TPU-native equivalents here:

* ``xla`` — ``jnp.fft`` lowered to the XLA:TPU FFT HLO. "Plan reuse"
  (FFTW's ``Flag::MEASURE`` + ``AlignedVec``, ``xcor_fftw.rs:29-46``) is
  subsumed by jit compilation caching the tuned executable.
* ``matmul`` — a four-step (Bailey/Cooley-Tukey) decomposition N = N1*N2
  evaluated as two dense DFT matmuls plus a twiddle multiply. It spends
  O(N*(N1+N2)) FLOPs instead of O(N log N), but they run on the MXU
  systolic array, which is exactly the trade TPUs want for batched
  mid-size transforms (cf. PAPERS.md mixed-radix DFT factorizations).

Both operate on the last axis and accept arbitrary leading batch dims.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from caf_cookoff_tpu.config import is_pow2


def _factor_two(n: int) -> Tuple[int, int]:
    """Split n = n1 * n2 with both factors as close to sqrt(n) as possible,
    preferring MXU-friendly (multiple-of-128-ish) second factors for pow2 n."""
    if is_pow2(n):
        half = n.bit_length() - 1
        n1 = 1 << (half // 2)
        return n1, n // n1
    # General n: largest divisor <= sqrt(n).
    best = 1
    for d in range(2, int(math.isqrt(n)) + 1):
        if n % d == 0:
            best = d
    return best, n // best


@functools.lru_cache(maxsize=32)
def _dft_constants(n: int, forward: bool, precision: str):
    """Host-side DFT factor matrices and twiddles for length n (np arrays)."""
    n1, n2 = _factor_two(n)
    sign = -2j if forward else 2j
    cdtype = np.complex64 if precision == "c64" else np.complex128
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    f1 = np.exp(sign * np.pi * np.outer(k1, k1) / n1).astype(cdtype)
    f2 = np.exp(sign * np.pi * np.outer(k2, k2) / n2).astype(cdtype)
    # twiddle[k1, m2] = exp(sign*pi*... * k1*m2 / n)
    tw = np.exp(sign * np.pi * np.outer(k1, k2) / n).astype(cdtype)
    return n1, n2, f1, f2, tw


def fft_matmul(x: jax.Array, *, forward: bool = True) -> jax.Array:
    """DFT over the last axis via two MXU matmuls (four-step algorithm).

    With index split x[m2*N1 + ... ] — concretely, writing the input index
    as n = N2*m1 + m2 and output index as k = k1 + N1*k2:

        X[k1 + N1 k2] = sum_m2 W_N^{k1 m2} ( sum_m1 x[N2 m1 + m2] W_N1^{k1 m1} ) W_N2^{k2 m2}
    """
    n = x.shape[-1]
    precision = "c64" if x.dtype == jnp.complex64 else "c128"
    n1, n2, f1, f2, tw = _dft_constants(n, forward, precision)
    f1 = jnp.asarray(f1)
    f2 = jnp.asarray(f2)
    tw = jnp.asarray(tw)
    xm = x.reshape(*x.shape[:-1], n1, n2)           # [m1, m2]
    y = jnp.einsum("ab,...bc->...ac", f1, xm)        # [k1, m2]
    y = y * tw
    z = jnp.einsum("...ab,bc->...ac", y, f2)         # [k1, k2]
    out = jnp.swapaxes(z, -1, -2).reshape(*x.shape)  # flatten as k1 + N1*k2
    if not forward:
        out = out / n
    return out


def _fft_xla(x: jax.Array) -> jax.Array:
    return jnp.fft.fft(x, axis=-1)


def _ifft_xla(x: jax.Array) -> jax.Array:
    return jnp.fft.ifft(x, axis=-1)


def _fft_mm(x: jax.Array) -> jax.Array:
    return fft_matmul(x, forward=True)


def _ifft_mm(x: jax.Array) -> jax.Array:
    return fft_matmul(x, forward=False)


def get_fft(backend: str) -> Tuple[Callable, Callable]:
    """(fft, ifft) pair for a backend name ('xla' | 'matmul')."""
    if backend == "xla":
        return _fft_xla, _ifft_xla
    if backend == "matmul":
        return _fft_mm, _ifft_mm
    raise ValueError(
        f"unknown FFT backend {backend!r}; the 'pallas' backend is a fused "
        "whole-surface kernel dispatched in models.filterbank, not a raw FFT")
