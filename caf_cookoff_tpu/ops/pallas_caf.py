"""Fully fused Pallas CAF kernel — the 'pallas' backend.

One kernel program computes, for a tile of doppler bins, the ENTIRE
per-bin pipeline with every intermediate resident in VMEM:

    phasor -> shift -> FFT -> x conj(H) -> IFFT -> |.|^2 -> per-bin argmax

The XLA 'matmul' backend round-trips each stage's (K, 8192) intermediate
through HBM (~26 MB x several stages); here only the needle, the
haystack spectrum, and the DFT constants are read and only K peak
triples (or the surface) are written — HBM traffic drops from O(K*M)
per stage to O(K) total for the peak path.

Zero-transpose four-step structure (the layout trick): with
M = N1 x N2, input index n = N2*m1 + m2 and spectrum kept in
UN-reordered (k1, k2) layout,

    forward:  left-matmul F1 (contract m1) -> twiddle -> right-matmul F2
    product:  elementwise in (k1, k2) layout — H is precomputed in the
              SAME layout, so the reorder permutation cancels
    inverse:  right-matmul IF2 (contract k2) -> conj twiddle
              -> left-matmul IF1 (contract k1) -> natural n order

Every matmul is a stacked split-complex 2-D MXU op ((2*N1, 2*N1) or
(2*N2, 2*N2)); no transpose or gather appears anywhere in the kernel.
Matmul inputs are cast to bfloat16 with float32 accumulation (MXU
native rate); the golden fixtures' peaks survive this exactly (verified
against the DEFAULT-precision XLA path, same arithmetic).

Reference analog: this kernel is the TPU replacement for the per-bin
work a rayon worker does (`caf_rust/src/caf/mod.rs:185-212`: shift,
2x FFT + pointwise + IFFT via `xcor_rustfft.rs:51-78`, fused
mag^2/argmax `mod.rs:94-102`) — one grid program = one worker's tile,
with the FFT plan ("Xcor::new") baked into the compiled kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caf_cookoff_tpu.config import is_pow2
from caf_cookoff_tpu.errors import EligibilityError
from caf_cookoff_tpu.ops.peak import CafPeak

# Doppler bins per kernel program. 8 keeps the per-program VMEM
# working set ~1.5 MB with full static unrolling.
TILE_BINS = 8


@functools.lru_cache(maxsize=16)
def _fourstep_constants(m: int):
    """Stacked butterfly matrices + twiddles for the (k1,k2)-layout
    four-step DFT of length m (numpy f32, cached)."""
    if not is_pow2(m):
        raise EligibilityError(
            f"pallas backend needs power-of-two M, got {m}")
    half = m.bit_length() - 1
    n1 = 1 << (half // 2)
    n2 = m // n1
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    a1 = -2.0 * np.pi * np.outer(k1, k1) / n1
    a2 = -2.0 * np.pi * np.outer(k2, k2) / n2
    at = -2.0 * np.pi * np.outer(k1, k2) / m

    def left(c, s):     # [[C, -S], [S, C]] : Y = FS @ [Xr; Xi]
        return np.block([[c, -s], [s, c]]).astype(np.float32)

    def right(c, s):    # [[C, S], [-S, C]] : Y = [Xr | Xi] @ FS
        return np.block([[c, s], [-s, c]]).astype(np.float32)

    consts = {
        "f1s": left(np.cos(a1), np.sin(a1)),            # (2n1, 2n1)
        "f2s": right(np.cos(a2), np.sin(a2)),           # (2n2, 2n2)
        "if2s": right(np.cos(a2), -np.sin(a2)),
        "if1s": left(np.cos(a1), -np.sin(a1)),
        "tw_re": np.cos(at).astype(np.float32),         # (n1, n2)
        "tw_im": np.sin(at).astype(np.float32),
    }
    return n1, n2, consts


def _dot1(a, b):
    """Single-pass MXU matmul at native bf16 rate, f32 accumulation."""
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _dot3(a, b):
    """3-pass error-compensated bf16 matmul (~f32 product accuracy).

    Splits each operand into a bf16 head plus a bf16 residual and sums
    the three significant cross products — the same scheme as XLA's
    ``Precision.HIGH``.  Needed because adjacent doppler bins of a CAF
    are near-ties (the true doppler resolution of an N-sample window is
    fs/N >> the search grid step), so single-pass bf16 can flip the
    argmax one bin.
    """
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    f32 = jnp.float32
    return (jnp.dot(ah, bh, preferred_element_type=f32)
            + jnp.dot(ah, bl, preferred_element_type=f32)
            + jnp.dot(al, bh, preferred_element_type=f32))


_DOTS = {"high": _dot3, "bf16": _dot1}
_BIG_IDX = np.int32(2**30)


def _fwd_noreorder(x2r, x2i, c, dot):
    """(n1, n2) planes -> spectrum planes in (k1, k2) layout."""
    n1 = x2r.shape[0]
    ys = dot(c["f1s"], jnp.concatenate([x2r, x2i], axis=0))
    yr, yi = ys[:n1], ys[n1:]
    tr = yr * c["tw_re"] - yi * c["tw_im"]
    ti = yr * c["tw_im"] + yi * c["tw_re"]
    zs = dot(jnp.concatenate([tr, ti], axis=1), c["f2s"])
    n2 = x2r.shape[1]
    return zs[:, :n2], zs[:, n2:]


def _inv_noreorder(zr, zi, c, dot):
    """(k1, k2)-layout spectrum -> natural-order (n1, n2) planes
    (unnormalized — a global 1/M scale is irrelevant to argmax)."""
    n1, n2 = zr.shape
    As = dot(jnp.concatenate([zr, zi], axis=1), c["if2s"])
    ar, ai = As[:, :n2], As[:, n2:]
    tr = ar * c["tw_re"] + ai * c["tw_im"]     # conj twiddle
    ti = ai * c["tw_re"] - ar * c["tw_im"]
    ys = dot(c["if1s"], jnp.concatenate([tr, ti], axis=0))
    return ys[:n1], ys[n1:]


def haystack_spectrum_noreorder(h_re, h_im, m: int):
    """Forward transform of the zero-padded haystack in (k1,k2) layout.

    Computed once per surface outside the kernel (a single transform —
    the hoisting every reference impl misses, SURVEY §3.1) with the same
    constants the kernel uses, so layouts match exactly.
    """
    n1, n2, c_np = _fourstep_constants(m)
    c = {k: jnp.asarray(v) for k, v in c_np.items()}
    n = h_re.shape[-1]
    x2r = jnp.pad(h_re, (0, m - n)).reshape(n1, n2)
    x2i = jnp.pad(h_im, (0, m - n)).reshape(n1, n2)
    # The hoisted haystack transform is one-time work: full f32 einsum.
    f32dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
    return _fwd_noreorder(x2r, x2i, c, f32dot)


def _caf_kernel(rates_ref, n_re_ref, n_im_ref, h2r_ref, h2i_ref,
                f1s_ref, f2s_ref, if2s_ref, if1s_ref, twr_ref, twi_ref,
                vals_ref, idxs_ref, *, needle_len: int, n1: int, n2: int,
                precision: str):
    """One program: TILE_BINS doppler bins, fused end-to-end."""
    dot = _DOTS[precision]
    c = {"f1s": f1s_ref[:], "f2s": f2s_ref[:], "if2s": if2s_ref[:],
         "if1s": if1s_ref[:], "tw_re": twr_ref[:], "tw_im": twi_ref[:]}
    h2r = h2r_ref[:]
    h2i = h2i_ref[:]
    nr = n_re_ref[:]                       # (rows, n2), rows = N / n2
    ni = n_im_ref[:]
    rows = needle_len // n2
    # Global sample index n = i*n2 + j for the phasor argument.
    # (Mosaic iota is integer-only; cast after.)
    sample_idx = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, n2), 0) * n2
        + jax.lax.broadcasted_iota(jnp.int32, (rows, n2), 1)
    ).astype(jnp.float32)

    for t in range(TILE_BINS):
        rate = rates_ref[t, 0]             # 2*pi*f/fs, SMEM scalar
        phase = rate * sample_idx
        cosw = jnp.cos(phase)
        sinw = jnp.sin(phase)
        sr = nr * cosw - ni * sinw         # shifted needle (rows, n2)
        si = nr * sinw + ni * cosw
        pad = jnp.zeros((n1 - rows, n2), jnp.float32)
        x2r = jnp.concatenate([sr, pad], axis=0)   # zero-pad to M
        x2i = jnp.concatenate([si, pad], axis=0)
        zr, zi = _fwd_noreorder(x2r, x2i, c, dot)
        # H * conj(S) in (k1,k2) layout (mod.rs:139 operand order).
        pr = h2r * zr + h2i * zi
        pi = h2i * zr - h2r * zi
        yr, yi = _inv_noreorder(pr, pi, c, dot)
        mag2 = yr * yr + yi * yi           # (n1, n2), natural order
        # 2-D-native argmax (no reshape — Mosaic layouts): lowest flat
        # index among maxima, matching find_peak_2d's tie-break.
        vmax = jnp.max(mag2)
        flat_idx = (
            jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0) * n2
            + jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1))
        vals_ref[t, 0] = vmax
        idxs_ref[t, 0] = jnp.min(
            jnp.where(mag2 >= vmax, flat_idx, _BIG_IDX))


@functools.partial(
    jax.jit,
    static_argnames=("needle_len", "fft_len", "interpret", "precision"))
def _pallas_peak_rows(n_re, n_im, h_re, h_im, rates, needle_len: int,
                      fft_len: int, interpret: bool = False,
                      precision: str = "high"):
    """Per-bin (peak value, peak lag) via the fused kernel: (K,), (K,)."""
    n1, n2, c_np = _fourstep_constants(fft_len)
    if needle_len % n2:
        raise EligibilityError(f"needle length {needle_len} not a multiple of "
                         f"the DFT column factor {n2}")
    k = rates.shape[0]
    if k % TILE_BINS:
        raise EligibilityError(f"bin count {k} not a multiple of {TILE_BINS}")
    h2r, h2i = haystack_spectrum_noreorder(h_re, h_im, fft_len)
    rows = needle_len // n2
    n2d = (n_re.reshape(rows, n2), n_im.reshape(rows, n2))

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    consts = [jnp.asarray(c_np[name])
              for name in ("f1s", "f2s", "if2s", "if1s", "tw_re", "tw_im")]

    vals, idxs = pl.pallas_call(
        functools.partial(_caf_kernel, needle_len=needle_len, n1=n1, n2=n2,
                          precision=precision),
        grid=(k // TILE_BINS,),
        in_specs=[
            pl.BlockSpec((TILE_BINS, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),      # rates
            full((rows, n2)), full((rows, n2)),          # needle planes
            full((n1, n2)), full((n1, n2)),              # H2 planes
            full((2 * n1, 2 * n1)), full((2 * n2, 2 * n2)),
            full((2 * n2, 2 * n2)), full((2 * n1, 2 * n1)),
            full((n1, n2)), full((n1, n2)),              # twiddles
        ],
        out_specs=(
            pl.BlockSpec((TILE_BINS, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_BINS, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.int32),
        ),
        interpret=interpret,
    )(rates.reshape(k, 1), n2d[0], n2d[1], h2r, h2i, *consts)
    return vals[:, 0], idxs[:, 0]


def _caf_surface_kernel(rates_ref, n_re_ref, n_im_ref, h2r_ref, h2i_ref,
                        f1s_ref, f2s_ref, if2s_ref, if1s_ref, twr_ref,
                        twi_ref, surf_ref, *, needle_len: int, n1: int,
                        n2: int, precision: str):
    """Surface-emitting variant: writes the (TILE_BINS, n1, n2) mag^2
    tile (natural lag order, XLA-parity 1/M^2 scale) instead of peaks."""
    dot = _DOTS[precision]
    c = {"f1s": f1s_ref[:], "f2s": f2s_ref[:], "if2s": if2s_ref[:],
         "if1s": if1s_ref[:], "tw_re": twr_ref[:], "tw_im": twi_ref[:]}
    h2r = h2r_ref[:]
    h2i = h2i_ref[:]
    nr = n_re_ref[:]
    ni = n_im_ref[:]
    rows = needle_len // n2
    scale = np.float32(1.0 / (n1 * n2)) ** 2
    sample_idx = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, n2), 0) * n2
        + jax.lax.broadcasted_iota(jnp.int32, (rows, n2), 1)
    ).astype(jnp.float32)
    for t in range(TILE_BINS):
        rate = rates_ref[t, 0]
        phase = rate * sample_idx
        cosw = jnp.cos(phase)
        sinw = jnp.sin(phase)
        sr = nr * cosw - ni * sinw
        si = nr * sinw + ni * cosw
        pad = jnp.zeros((n1 - rows, n2), jnp.float32)
        zr, zi = _fwd_noreorder(jnp.concatenate([sr, pad], axis=0),
                                jnp.concatenate([si, pad], axis=0), c, dot)
        pr = h2r * zr + h2i * zi
        pi = h2i * zr - h2r * zi
        yr, yi = _inv_noreorder(pr, pi, c, dot)
        surf_ref[t] = (yr * yr + yi * yi) * scale


@functools.partial(
    jax.jit, static_argnames=("needle_len", "fft_len", "interpret",
                              "precision"))
def _pallas_surface(n_re, n_im, h_re, h_im, rates, needle_len: int,
                    fft_len: int, interpret: bool = False,
                    precision: str = "high"):
    """(K, M) mag^2 surface from the fused kernel (K padded to tile)."""
    n1, n2, c_np = _fourstep_constants(fft_len)
    k = rates.shape[0]
    if k % TILE_BINS:
        raise EligibilityError(f"bin count {k} not a multiple of {TILE_BINS}")
    h2r, h2i = haystack_spectrum_noreorder(h_re, h_im, fft_len)
    rows = needle_len // n2

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    consts = [jnp.asarray(c_np[name])
              for name in ("f1s", "f2s", "if2s", "if1s", "tw_re", "tw_im")]
    surf = pl.pallas_call(
        functools.partial(_caf_surface_kernel, needle_len=needle_len,
                          n1=n1, n2=n2, precision=precision),
        grid=(k // TILE_BINS,),
        in_specs=[
            pl.BlockSpec((TILE_BINS, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            full((rows, n2)), full((rows, n2)),
            full((n1, n2)), full((n1, n2)),
            full((2 * n1, 2 * n1)), full((2 * n2, 2 * n2)),
            full((2 * n2, 2 * n2)), full((2 * n1, 2 * n1)),
            full((n1, n2)), full((n1, n2)),
        ],
        out_specs=pl.BlockSpec((TILE_BINS, n1, n2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n1, n2), jnp.float32),
        interpret=interpret,
    )(rates.reshape(k, 1), n_re.reshape(rows, n2), n_im.reshape(rows, n2),
      h2r, h2i, *consts)
    return surf.reshape(k, n1 * n2)


def _pad_needle_to_columns(n_re, n_im, fft_len: int):
    """Zero-pad the needle to a multiple of the DFT column factor.

    Appended zeros contribute nothing to any correlation lag, so results
    are identical; this lifts the kernel's layout requirement for
    non-power-of-two needle lengths."""
    _, n2, _ = _fourstep_constants(fft_len)
    n = n_re.shape[-1]
    pad = (-n) % n2
    if pad:
        n_re = jnp.pad(n_re, (0, pad))
        n_im = jnp.pad(n_im, (0, pad))
    return n_re, n_im


def pallas_caf_surface(n_re, n_im, h_re, h_im, freqs_hz, sample_rate,
                       fft_len: int, precision: str = "high",
                       num_bins: Optional[int] = None) -> jax.Array:
    """(K, M) mag^2 surface on split planes via the fused kernel."""
    import jax as _jax

    n_re, n_im = _pad_needle_to_columns(n_re, n_im, fft_len)
    needle_len = n_re.shape[-1]
    freqs_hz = jnp.asarray(freqs_hz)
    k = freqs_hz.shape[0]
    pad = (-k) % TILE_BINS
    if pad:
        freqs_hz = jnp.concatenate(
            [freqs_hz, jnp.broadcast_to(freqs_hz[-1:], (pad,))])
    rates = (2.0 * jnp.pi) * freqs_hz.astype(jnp.float32) / float(sample_rate)
    interpret = _jax.default_backend() == "cpu"
    surf = _pallas_surface(n_re, n_im, h_re, h_im, rates, needle_len,
                           fft_len, interpret, precision)
    return surf[:k]


@functools.partial(
    jax.jit, static_argnames=("needle_len", "fft_len", "interpret"))
def _refined_peak(n_re, n_im, h_re, h_im, rates, needle_len: int,
                  fft_len: int, interpret: bool = False):
    """Two-stage peak: bf16 coarse sweep + 3-pass re-scoring of the top
    TILE_BINS candidate bins.

    Single-pass bf16 can flip the argmax to an adjacent (near-tie)
    doppler bin, but the true bin always lands in the top few coarse
    values; re-evaluating just TILE_BINS candidates at ~f32 accuracy
    (one extra kernel program, ~2% of the coarse cost) restores
    bin-exact answers at almost-bf16 speed.
    """
    vals, idxs = _pallas_peak_rows.__wrapped__(
        n_re, n_im, h_re, h_im, rates, needle_len, fft_len, interpret,
        "bf16")
    _, cand = jax.lax.top_k(vals, TILE_BINS)          # candidate bins
    vals2, idxs2 = _pallas_peak_rows.__wrapped__(
        n_re, n_im, h_re, h_im, rates[cand], needle_len, fft_len,
        interpret, "high")
    # Among candidates, prefer highest value; break exact ties toward
    # the lowest bin index (find_peak_2d semantics).
    order = jnp.lexsort((cand.astype(jnp.int32), -vals2))
    best = order[0]
    return CafPeak(value=vals2[best], freq_idx=cand[best].astype(jnp.int32),
                   lag_idx=idxs2[best])


def pallas_caf_peak(n_re, n_im, h_re, h_im, freqs_hz, sample_rate,
                    fft_len: int, precision: str = "high") -> CafPeak:
    """Fused surface+peak on split planes; returns the global CafPeak.

    The tiny (K,) per-bin reduction happens outside the kernel; the
    surface itself never exists in HBM.  Bin counts are padded to the
    kernel tile by repeating the last frequency (duplicate rows can
    only tie, and the lowest-index winner is the original bin).
    """
    n_re, n_im = _pad_needle_to_columns(n_re, n_im, fft_len)
    needle_len = n_re.shape[-1]
    freqs_hz = jnp.asarray(freqs_hz)
    k = freqs_hz.shape[0]
    pad = (-k) % TILE_BINS
    if pad:
        freqs_hz = jnp.concatenate(
            [freqs_hz, jnp.broadcast_to(freqs_hz[-1:], (pad,))])
    rates = (2.0 * jnp.pi) * freqs_hz.astype(jnp.float32) / float(sample_rate)
    # Interpreter mode on CPU (tests / virtual meshes); compiled on TPU.
    interpret = jax.default_backend() == "cpu"
    if precision == "refine":
        peak = _refined_peak(n_re, n_im, h_re, h_im, rates, needle_len,
                             fft_len, interpret)
        return CafPeak(peak.value,
                       jnp.minimum(peak.freq_idx, k - 1), peak.lag_idx)
    vals, idxs = _pallas_peak_rows(n_re, n_im, h_re, h_im, rates,
                                   needle_len, fft_len, interpret, precision)
    best = jnp.argmax(vals)
    # argmax takes the first maximum, so an original bin always beats its
    # padded duplicates; the clamp is belt-and-braces for exact ties.
    return CafPeak(value=vals[best],
                   freq_idx=jnp.minimum(best, k - 1).astype(jnp.int32),
                   lag_idx=idxs[best])
