#!/usr/bin/env python
"""Normalized plan diff: strip expression IDs (#123), plan/operator ids,
codegen ids, and parser-assigned lambda variable suffixes (x_42), then
unified-diff the two files. Empty output = plans identical modulo ids.

Usage: python tools/normdiff.py plans/r13/q_before.txt plans/r13/q_after.txt
"""

from __future__ import annotations

import difflib
import re
import sys


def norm(path: str) -> list[str]:
    out = []
    with open(path) as f:
        for line in f:
            s = re.sub(r"#\d+[L]?", "#_", line)
            # parser-assigned lambda variable NAMES differ between the
            # Column-DSL (x_7) and SQL-text ((x, y) ->) forms; names are
            # binding-only (evaluation is positional), so normalize them
            s = re.sub(r"lambda [a-zA-Z_][a-zA-Z0-9_]*#", "lambda _#", s)
            s = re.sub(r"\b(lambda )?([a-zA-Z]+)_\d+\b", r"\1\2_", s)
            s = re.sub(r"^\(\d+\) ", "(_) ", s)
            s = re.sub(r"\[plan_id=\d+\]", "[plan_id=_]", s)
            s = re.sub(r"\[codegen id : \d+\]", "[codegen id : _]", s)
            s = re.sub(r"Subquery:? (subquery)?#?_?\d*", "Subquery#_", s)
            s = re.sub(r"cte\[\d+\]", "cte[_]", s)
            # store/scan locations: the same fingerprinted store read from
            # a different checkout root is the same plan
            s = re.sub(r"file:[^ \]]*/\.stores/", "file:.../.stores/", s)
            # createDataFrame RDD ids are process-history artifacts
            s = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[_]", s)
            s = re.sub(r"file:[^ \]]*/testdata/", "file:.../testdata/", s)
            out.append(s)
    return out


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    diff = list(difflib.unified_diff(norm(a), norm(b), a, b, n=0))
    for line in diff:
        sys.stdout.write(line)
    sys.exit(1 if diff else 0)


if __name__ == "__main__":
    main()
