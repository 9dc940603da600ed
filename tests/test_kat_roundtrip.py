"""Self-contained KAT round trip: generate a corpus through this framework's
generator, then validate every recognized file with the KAT checkers (including
the full generator-stream replay and, when mounted, the live-reference
aggregate cross-check).  This regression needs no pre-existing corpus."""
import runpy
import sys
from pathlib import Path

from fusion_cryptography_tpu.interop import kat


def test_generate_then_check(tmp_path, monkeypatch):
    gen = Path(__file__).resolve().parent.parent / "KATs" / "generate_kat_values.py"
    monkeypatch.setattr(
        sys, "argv",
        ["generate_kat_values.py", "--out-dir", str(tmp_path), "--seed", "777",
         "--secpars", "128"],
    )
    runpy.run_path(str(gen), run_name="__main__")
    assert len(list(tmp_path.glob("*.csv"))) == 9
    results = kat.run_all(tmp_path)
    assert results, "no checkers matched generated files"
    for name, rows in results.items():
        assert all(rows), f"{name} failed rows {[i for i, r in enumerate(rows) if not r]}"
