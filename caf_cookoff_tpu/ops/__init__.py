"""Core DSP ops: frequency translation, FFT cross-correlation, peak extraction."""

from caf_cookoff_tpu.ops.peak import find_peak_2d, surface_peak
from caf_cookoff_tpu.ops.shift import apply_fdoa, freq_shift, phasor_bank
from caf_cookoff_tpu.ops.xcor import xcor, xcor_bank, xcor_pair

__all__ = [
    "apply_fdoa",
    "find_peak_2d",
    "freq_shift",
    "phasor_bank",
    "surface_peak",
    "xcor",
    "xcor_bank",
    "xcor_pair",
]
