"""Acceptance-artifact hygiene (VERDICT r4 #2): every row of a committed
results_rN.json must be measured at ONE git SHA — a stale row from an
earlier code state contradicted the round-4 ledger."""
import glob
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rows(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(ROOT, "benchmarks", "results_r0[5-9]*.json"))))
def test_uniform_sha(path):
    rows = [r for r in _rows(path) if "config" in r]
    assert rows, f"{path}: no config rows"
    shas = {r.get("git_sha") for r in rows}
    assert len(shas) == 1 and "unknown" not in shas and None not in shas, (
        f"{path}: rows span git SHAs {shas} — re-run the full matrix at "
        "one committed state")
    assert not any(r.get("git_dirty") for r in rows), (
        f"{path}: rows measured with uncommitted changes")


def test_r05_artifact_expected():
    """The round-5 artifact must exist by round end (driver protocol)."""
    if not glob.glob(os.path.join(ROOT, "benchmarks", "results_r05*.json")):
        pytest.skip("results_r05.json not yet generated (TPU run pending)")
