"""Hybrid refine-candidate selection (models/stein._refine_candidates).

Retires the ``_REFINE_BINS`` clustering caveat: on grids much finer
than the doppler mainlobe (fs/N) the plain top-k coarse picks all sit
on one emitter's skirt, so a distant competitor within a few percent of
the winner was never exactly re-scored.  The candidate set is now plain
top-k UNION a mainlobe-separated top-k (``ops.peak.topk_separated``),
guaranteeing distinct-lobe coverage while keeping the adjacent
near-tie-flip coverage the plain picks provide.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from caf_cookoff_tpu.ops.peak import doppler_cell_bins, topk_separated

FS = 48_000.0


def test_topk_separated_covers_distinct_lobes():
    vals = np.full(4000, -1.0, np.float32)
    # Lobe A: a 21-bin skirt around 1000, values 100 down to 99.98.
    for d in range(-10, 11):
        vals[1000 + d] = 100.0 - 0.001 * abs(d)
    # Lobe B: a distant competitor below every skirt bin.
    vals[3000] = 99.9
    plain = set(np.argsort(vals)[-8:])
    assert 3000 not in plain            # the failure mode being fixed
    sep = topk_separated(jnp.asarray(vals), 4, 200)
    assert 1000 in set(np.asarray(sep))
    assert 3000 in set(np.asarray(sep))


def test_topk_separated_traced_separation():
    """sep may be a traced value (derived from a traced grid)."""
    import jax

    vals = jnp.asarray(np.array([5.0, 4.9, 4.8, 1.0, 4.85], np.float32))
    out = jax.jit(lambda v, s: topk_separated(v, 2, s))(
        vals, jnp.asarray(3, jnp.int32))
    assert out.tolist() == [0, 4]


def test_doppler_cell_bins_matches_resolution_cell():
    from caf_cookoff_tpu.ops.peak import resolution_cell

    rng = np.random.default_rng(0)
    needle = (rng.standard_normal(4096)
              + 1j * rng.standard_normal(4096)).astype(np.complex64)
    for step in (0.5, 0.05):
        freqs = np.arange(-100, 100, step, dtype=np.float32)
        traced = int(doppler_cell_bins(jnp.asarray(freqs), 4096, FS))
        host = resolution_cell(needle, freqs, FS)[0]
        assert traced == host


def test_refine_topk_recovers_distant_lobe():
    """A coarse ranking whose top-8 all cluster on one skirt: the exact
    re-score must still see (and pick) the distant TRUE winner."""
    from caf_cookoff_tpu.models.stein import _refine_topk
    from caf_cookoff_tpu.config import xcor_length
    from caf_cookoff_tpu.ops.splitfft import split_array

    rng = np.random.default_rng(7)
    n = 1024
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    t = np.arange(n)
    f_near, f_far = -30.0, 41.0
    hay = (1.0 * needle * np.exp(2j * np.pi * f_near * t / FS)
           + 1.02 * needle * np.exp(2j * np.pi * f_far * t / FS)
           ).astype(np.complex64)
    freqs = np.arange(-50.0, 50.0, 0.05, dtype=np.float32)
    k_near = int(np.argmin(np.abs(freqs - f_near)))
    k_far = int(np.argmin(np.abs(freqs - f_far)))
    # Adversarial coarse ranking: the far (true) winner ranks 30th, the
    # near emitter's skirt fills every top slot — the exact pre-fix
    # clustering scenario (models/stein.py's old _REFINE_BINS caveat).
    rowmax = np.zeros(len(freqs), np.float32)
    for d in range(-20, 21):
        rowmax[k_near + d] = 100.0 - 0.001 * abs(d)
    rowmax[k_far] = 99.0
    n_sp = split_array(needle)
    h_sp = split_array(hay)
    peak = _refine_topk(
        (jnp.asarray(n_sp[0]), jnp.asarray(n_sp[1])),
        (jnp.asarray(h_sp[0]), jnp.asarray(h_sp[1])),
        jnp.asarray(freqs), jnp.asarray(rowmax), FS,
        xcor_length(n), "xla")
    assert int(peak.freq_idx) == k_far


@pytest.mark.parametrize("engine", ["stein", "batched"])
def test_fine_grid_two_emitters_match_exact_oracle(engine):
    """End-to-end: on a 0.05 Hz grid (mainlobe ~234 bins) with two
    near-equal emitters on distant lobes, the segmented engines answer
    exactly what the exact filterbank surface answers."""
    from caf_cookoff_tpu.models.filterbank import caf_peak
    from caf_cookoff_tpu.models.stein import stein_caf_peak
    from caf_cookoff_tpu.models.batched_stein import batched_stein_peak

    rng = np.random.default_rng(7)
    n = 1024
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    t = np.arange(n)
    hay = (1.0 * needle * np.exp(2j * np.pi * -30.0 * t / FS)
           + 0.995 * needle * np.exp(2j * np.pi * 41.0 * t / FS)
           + (1e-4 * (rng.standard_normal(n)
                      + 1j * rng.standard_normal(n)))).astype(np.complex64)
    freqs = np.arange(-50.0, 50.0, 0.05, dtype=np.float32)
    want_f, want_lag, _ = caf_peak(needle, hay, freqs, FS, backend="xla")
    if engine == "stein":
        got_f, got_lag, _ = stein_caf_peak(needle, hay, freqs, FS,
                                           backend="xla")
    else:
        fr, lg, _ = batched_stein_peak(needle[None], hay[None], freqs,
                                       FS, backend="xla")
        got_f, got_lag = float(fr[0]), int(lg[0])
    assert (got_f, got_lag) == (want_f, want_lag)
