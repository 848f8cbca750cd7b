"""Utilities: signal I/O, fixture generation, SigMF, profiling, reporting."""

from caf_cookoff_tpu.utils.io import (
    dump_surf,
    load_c64,
    load_f32,
    parse_ground_truth,
    write_c64,
    write_c128,
)

__all__ = [
    "dump_surf",
    "load_c64",
    "load_f32",
    "parse_ground_truth",
    "write_c64",
    "write_c128",
]
