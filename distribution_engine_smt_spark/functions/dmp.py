"""Ordered body-edit fold — the one genuine Python UDF in the engine.

The reference receives comment edits as diff-match-patch patch text and
applies them to the stored body, falling back to the raw text when the text
doesn't parse as patches (reference:
comment_processor_for_engine.py:102-130). This is inherently order-sensitive
per post, so it runs as ``applyInPandas`` grouped by authorperm, sorted by
(block_num, op_seq) — SURVEY.md §2.8 F17 / §2.9 ST7.

Patch parsing and fuzzy application come from ``dmp_core`` (a
vendored-equivalent subset of Neil Fraser's Apache-2.0 diff-match-patch
library — see its header for attribution); the real ``diff_match_patch``
library is preferred when installed. Matching the
reference exactly: per-patch success flags are IGNORED (``new_body, _ =
dmp.patch_apply(...)``) — a partially-applied patch set still replaces the
body with whatever came out.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

RESULT_SCHEMA = StructType(
    [
        StructField("authorperm", StringType(), True),
        StructField("body", StringType(), True),
    ]
)


def apply_body_edit(base: str, edit: str) -> str:
    """One edit step: DMP patch text applies to ``base``; anything that
    doesn't parse as patch text is a full body replacement — the
    reference's fallback chain (comment_processor_for_engine.py:105-130)."""
    try:
        from diff_match_patch import diff_match_patch as _DMP

        dmp = _DMP()
        patch_from_text, patch_apply = dmp.patch_fromText, dmp.patch_apply
    except Exception:
        from . import dmp_core

        patch_from_text, patch_apply = dmp_core.patch_from_text, dmp_core.patch_apply
    if not isinstance(edit, str):
        return edit
    try:
        patches = patch_from_text(edit)
    except Exception:
        return edit
    if not patches:
        return edit
    new_body, _results = patch_apply(patches, base or "")
    return new_body


def build_fold_group():
    """Build the per-group fold closure, shipped BY VALUE (executors need
    neither this package nor the library installed — see the registration
    below).  Exposed so tests can pickle it and prove self-containment."""

    # Executors don't have this package on sys.path: register dmp_core for
    # by-value pickling so the closure below (which captures its two entry
    # points) ships the whole patch engine inside the serialized UDF —
    # restoring the self-contained guarantee streaming/stateful.py documents.
    from pyspark import cloudpickle as _cp

    from . import dmp_core as _dmp_core

    _cp.register_pickle_by_value(_dmp_core)
    core_from_text, core_apply = _dmp_core.patch_from_text, _dmp_core.patch_apply

    def fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        try:  # the real library wins when the executor env has it
            from diff_match_patch import diff_match_patch as _DMP

            _d = _DMP()
            patch_from_text, patch_apply = _d.patch_fromText, _d.patch_apply
        except Exception:
            patch_from_text, patch_apply = core_from_text, core_apply

        def apply_edit(base: str, edit: str) -> str:
            if not isinstance(edit, str):
                return edit
            try:
                patches = patch_from_text(edit)
            except Exception:
                return edit
            if not patches:
                return edit
            new_body, _results = patch_apply(patches, base or "")
            return new_body

        pdf = pdf.sort_values(["block_num", "op_seq"])
        body = ""
        first = True
        for edit in pdf["body"]:
            if first:
                body = edit or ""
                first = False
            else:
                body = apply_edit(body, edit)
        return _pd.DataFrame(
            {"authorperm": [pdf["authorperm"].iloc[0]], "body": [body]}
        )

    return fold_group


def fold_body_edits(edits: DataFrame) -> DataFrame:
    """edits(authorperm, block_num, op_seq, body) -> final body per authorperm.

    Distributed: one Arrow batch per authorperm group; groups shuffle-hash on
    authorperm so the fold parallelizes across executors. Edit chains per
    post are short (human-scale), so group size is bounded.
    """
    return (
        edits.select("authorperm", "block_num", "op_seq", "body")
        .groupBy("authorperm")
        .applyInPandas(build_fold_group(), RESULT_SCHEMA)
    )
