"""Surface engines (the reference's "strategy" layer, SURVEY §1 L3).

Engine families:

* :mod:`filterbank` — the flagship single-program engine: one jitted XLA
  program computes the whole delay x doppler surface (subsumes all seven
  reference CPU strategies, SURVEY §2.3).
* :mod:`stein` — time-segmented fast path (Stein 1981) with exact top-k
  refinement: the fastest golden-exact configuration.
* :mod:`batched` — many (needle, haystack) pairs at once, memory-bounded.
* :mod:`overlap_save` — wideband/long-haystack segmented correlation.
* :mod:`streaming` — continuous chunked processing of a live capture.
"""

from caf_cookoff_tpu.models.filterbank import FilterbankCAF, amb_surf, caf_peak, caf_surface, find_peak
from caf_cookoff_tpu.models.overlap_save import (
    overlap_save_peak,
    overlap_save_surface,
)
from caf_cookoff_tpu.models.stein import (
    stein_caf_peak,
    stein_caf_surface,
    stein_overlap_save_peak,
)

__all__ = [
    "FilterbankCAF",
    "amb_surf",
    "caf_peak",
    "caf_surface",
    "find_peak",
    "overlap_save_peak",
    "overlap_save_surface",
    "stein_caf_peak",
    "stein_caf_surface",
    "stein_overlap_save_peak",
]
