"""Known-Answer-Test parity against the reference corpus (bit-exact reprs).

These tests parse /root/reference/KATs/KAT_values/*.csv and regenerate every
output through this framework; any single character of drift fails.  This is
the primary correctness anchor demanded by BASELINE.json's north star.
"""
from pathlib import Path

import pytest

from fusion_cryptography_tpu.interop import kat

pytestmark = [pytest.mark.fast, pytest.mark.smoke]

KAT_DIR = kat.DEFAULT_KAT_DIR
present = sorted(p.name for p in KAT_DIR.glob("*.csv")) if KAT_DIR.exists() else []


@pytest.mark.skipif(not present, reason="reference KAT corpus not mounted")
@pytest.mark.parametrize("name", [n for n in kat.CHECKERS if n in present])
def test_kat_file(name):
    results = kat.CHECKERS[name](KAT_DIR / name)
    assert results, f"no rows parsed from {name}"
    bad = [i for i, ok in enumerate(results) if not ok]
    assert not bad, f"{name}: rows {bad} mismatch ({len(bad)}/{len(results)})"
