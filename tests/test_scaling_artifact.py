"""Weak-scaling structure artifact (VERDICT r3 #8, benchmarks/scaling.py).

SCALING_r05.json records the 1→8-shard weak-scaling sweep of the
distributed DIA SpMV and a fixed-iteration distributed CG on the virtual
CPU mesh.  On this single-core host the metric is STRUCTURAL efficiency
eff(P) = P·t(1)/t(P) — 1.0 means the halo/psum machinery adds no work
over the shard-local compute (see the module docstring there for why
this is the honest measurable on serialized virtual devices).

These tests pin the committed artifact: both curves present at every
shard count with efficiency above a floor.  Regenerate with
``python benchmarks/scaling.py --out SCALING_r05.json`` on an idle host.
"""
import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SCALING_r05.json")

# Per-shard-count floors (VERDICT r4 #9: the uniform 0.6 floor could not
# catch a P=2-4 structural regression).  Set from the measured range over
# rounds 4-5 on this single-core host (P=2: 0.79-0.92, P=4: 0.74-0.91,
# P=8: 0.69-0.83) minus a noise margin — the box swings ~0.1 between
# idle runs, so tighter floors would flake without catching more.
FLOORS = {2: 0.70, 4: 0.65, 8: 0.60}
SHARDS = (1, 2, 4, 8)


@pytest.fixture(scope="module")
def records():
    if not os.path.exists(ART):
        pytest.skip("SCALING_r05.json not generated")
    with open(ART) as f:
        return [json.loads(line) for line in f if line.strip()]


@pytest.mark.parametrize("op", ["dist_dia_spmv", "dist_cg_jacobi"])
def test_curve_complete(records, op):
    got = {r["shards"]: r for r in records if r["op"] == op}
    assert set(SHARDS) <= set(got), f"{op}: missing shard counts"
    for P in SHARDS:
        assert got[P]["rows_per_shard"] >= 100_000   # weak scaling, not toy


@pytest.mark.parametrize("op", ["dist_dia_spmv", "dist_cg_jacobi"])
def test_efficiency_floor(records, op):
    effs = {r["shards"]: r["weak_eff_structural"]
            for r in records if r["op"] == op}
    for P in SHARDS[1:]:
        assert effs[P] >= FLOORS[P], (
            f"{op} structural weak-scaling efficiency {effs[P]} at "
            f"{P} shards below the {FLOORS[P]} floor — the distributed "
            "machinery is adding disproportionate work")
