"""MIGRATION.md is a contract: every `caf_cookoff_tpu.X` symbol and
every `module.function` path it names must exist, so the migration map
cannot rot as the API evolves."""

import re
from pathlib import Path

import caf_cookoff_tpu

REPO = Path(__file__).resolve().parent.parent
DOC = (REPO / "MIGRATION.md").read_text()


def test_migration_doc_top_level_symbols_exist():
    names = set(re.findall(r"`caf_cookoff_tpu\.(\w+)", DOC))
    assert names, "no symbols found — parsing broke?"
    missing = sorted(n for n in names if not hasattr(caf_cookoff_tpu, n))
    assert not missing, f"MIGRATION.md names absent symbols: {missing}"


def test_migration_doc_module_paths_exist():
    import importlib

    # `utils.io.load_c64`-style dotted paths (module under the package).
    for mod_path, attr in set(re.findall(
            r"`((?:utils|ops|parallel|models)\.\w+)\.(\w+)`", DOC)):
        mod = importlib.import_module(f"caf_cookoff_tpu.{mod_path}")
        assert hasattr(mod, attr), f"{mod_path}.{attr} in MIGRATION.md " \
            f"does not exist"


def test_migration_doc_file_references_exist():
    # Our-side file references like (`models/filterbank.py`) must exist.
    for ref in set(re.findall(r"`((?:caf_cookoff_tpu/|models/|ops/|utils/"
                              r"|parallel/|native/)[\w/]+\.(?:py|cpp|h|md))`",
                              DOC)):
        p = REPO / ("caf_cookoff_tpu/" + ref
                    if not ref.startswith(("caf_cookoff_tpu/", "native/"))
                    else ref)
        assert p.exists(), f"MIGRATION.md references missing file {ref}"


def test_grc_flowgraphs_parse():
    """The companion GRC flowgraphs (round 5 — the reference ships
    .grc files; ours must at least be structurally valid GRC YAML with
    consistent connections, since no GNU Radio exists here to open
    them)."""
    import yaml

    for name in ("generate_pulses.grc", "capture_sigmf.grc"):
        d = yaml.safe_load((REPO / "grc" / name).read_text())
        assert d["metadata"]["file_format"] == 1
        names = {b["name"] for b in d["blocks"]}
        assert len(names) == len(d["blocks"])    # unique block names
        for src, _, dst, _ in d["connections"]:
            assert src in names and dst in names, (name, src, dst)
        # Every artifact the flowgraph writes is a format our loaders
        # read (WAV via utils/pulses, SigMF via utils/sigmf).
        text = (REPO / "grc" / name).read_text()
        assert "sigmf_sink" in text
