"""The expected-output oracle fixtures (fixtures/golden/expected/*) must
stay in lockstep with the pure-Python implementations that define them —
silent drift would turn the driver's hash gate for the five
binary-payload queries into a stale comparison."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from scripts.build_expected_oracles import BUILDERS, EXPECTED


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_expected_fixture_matches_current_spec(name):
    committed = pq.read_table(EXPECTED / f"{name}.parquet")
    recomputed = BUILDERS[name]()
    assert committed.schema == recomputed.schema, f"{name}: schema drift"
    assert committed.equals(recomputed), (
        f"{name}: fixture drift — if the semantics change was intentional, "
        "run scripts/build_expected_oracles.py and bump EXTRACTOR_VERSION"
    )
