"""Pins for the committed full-registry correctness artifact
(``LOCAL_CORRECTNESS_r*.json``, written by ``local_correctness.py``) and
the driver-evidence rotation invariant (VERDICT r9 #1/#2).

The driver's oracle gate caps at 50 queries/round; these tests make the
two compensating mechanisms enforceable:

1. the committed local artifact must cover the FULL registry with the
   driver's per-query record schema, all green;
2. the rotation head must contain every query whose driver evidence
   would otherwise age past the K-round bound.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

import distribution_engine_smt_spark.pipeline  # noqa: F401  (registers extension queries)
from distribution_engine_smt_spark.driver_queries import ORACLE_SQL, QUERIES

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RECORD_KEYS = {
    "rows_match",
    "schema_match",
    "hash_match",
    "spark_rows",
    "oracle_rows",
    "err",
}

# Worst-case driver-evidence age bound (rounds). A query last
# driver-green at round L must re-enter the driver head no later than
# round L + MAX_EVIDENCE_AGE.
MAX_EVIDENCE_AGE = 4


def _latest(pattern: str) -> str | None:
    files = sorted(glob.glob(os.path.join(ROOT, pattern)))
    return files[-1] if files else None


def test_local_artifact_schema_and_coverage():
    """The newest LOCAL_CORRECTNESS artifact covers every registered
    query, uses exactly the driver's record schema, and is all-green
    (hash match for every oracle-backed query)."""
    path = _latest("LOCAL_CORRECTNESS_r*.json")
    if path is None:
        pytest.skip("no LOCAL_CORRECTNESS artifact committed yet")
    with open(path) as f:
        records = json.load(f)
    missing = sorted(set(QUERIES) - set(records))
    assert not missing, f"{os.path.basename(path)} missing queries: {missing}"
    for name, rec in records.items():
        assert set(rec) == RECORD_KEYS, f"{name}: record keys {sorted(rec)}"
    red = sorted(
        n
        for n, r in records.items()
        if n in QUERIES
        and not r["hash_match"]
        and r["err"] != "no_oracle"
    )
    assert not red, f"{os.path.basename(path)} non-green queries: {red}"
    # every oracle-backed query must have full-strength evidence
    weak = sorted(
        n for n in ORACLE_SQL if n in records and records[n]["err"] == "no_oracle"
    )
    assert not weak, f"oracle exists but artifact recorded no_oracle: {weak}"


def _driver_green_rounds() -> tuple[int, dict[str, int]]:
    """(max recorded round, {query: latest driver-green round})."""
    latest: dict[str, int] = {}
    max_round = 0
    for f in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        with open(f) as fh:
            for q, rec in json.load(fh).items():
                green = rec.get("hash_match") or (
                    rec.get("rows_match") and rec.get("err") is None
                )
                if green:
                    latest[q] = max(latest.get(q, 0), rnd)
    return max_round, latest


def test_rotation_keeps_driver_evidence_fresh():
    """Standing invariant: no registered query's driver evidence may age
    past MAX_EVIDENCE_AGE rounds. A query last green at round L has age
    R+1-L after the NEXT driver round R+1; if that exceeds the bound and
    the query is not in the current top-50 head, the rotation has failed
    it. (Zero-row queries are covered by the no-starve test.)"""
    import __spark_entry__ as e

    max_round, latest = _driver_green_rounds()
    if max_round == 0:
        pytest.skip("no driver CORRECTNESS records yet")
    head = set(list(e.queries())[:50])
    next_round = max_round + 1
    overdue = sorted(
        q
        for q, last in latest.items()
        if q in QUERIES
        and next_round - last > MAX_EVIDENCE_AGE
        and q not in head
    )
    assert not overdue, (
        f"driver evidence would age past {MAX_EVIDENCE_AGE} rounds for "
        f"queries outside the driver head: {overdue}"
    )
