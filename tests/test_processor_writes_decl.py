"""The runner's touched-partition scoping trusts L1_WRITES / L2_WRITES; this
cross-checks the declarations against the literal out[...] assignments in the
processor sources so a new table write cannot be silently dropped at save
time."""

from __future__ import annotations

import re
from pathlib import Path

import distribution_engine_smt_spark.processors.l1 as l1
import distribution_engine_smt_spark.processors.l2 as l2


def _assigned_tables(module) -> set[str]:
    src = Path(module.__file__).read_text()
    return set(re.findall(r'out\["(\w+)"\]', src))


def test_l1_writes_covers_processor_assignments():
    assert _assigned_tables(l1) <= l1.L1_WRITES


def test_l2_writes_covers_processor_assignments():
    assert _assigned_tables(l2) <= l2.L2_WRITES
