"""Ordered body-edit fold — the one genuine Python UDF in the engine.

The reference receives comment edits as diff-match-patch patch text and
applies them to the stored body, falling back to the raw text when the patch
doesn't apply (reference: comment_processor_for_engine.py:102-130). This is
inherently order-sensitive per post and needs the DMP library, so it runs as
``applyInPandas`` grouped by authorperm, sorted by (block_num, op_seq) —
SURVEY.md §2.8 F17 / §2.9 ST7.

The ``diff_match_patch`` library is not available in this container; the
patch-apply step degrades to "treat the edit as a full body replacement",
which is also the reference's final fallback. The Spark-side plumbing
(grouping, ordering, Arrow batching, schema) is real and tested.
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


def fold_body_edits(edits: DataFrame) -> DataFrame:
    """edits(authorperm, block_num, op_seq, body) -> final body per authorperm.

    Distributed: one Arrow batch per authorperm group; groups shuffle-hash on
    authorperm so the fold parallelizes across executors. Edit chains per
    post are short (human-scale), so group size is bounded.

    The grouped function is fully self-contained (helpers nested, imports
    inside) so cloudpickle ships it by value — executors don't need this
    package importable.
    """

    def fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        try:
            from diff_match_patch import diff_match_patch as _DMP

            dmp = _DMP()
        except Exception:
            dmp = None

        def apply_one(base: str, edit: str) -> str:
            # DMP patch if it parses and applies, else full replacement —
            # the reference's fallback chain
            # (comment_processor_for_engine.py:109-126)
            if dmp is not None and isinstance(edit, str) and edit.startswith("@@"):
                try:
                    patches = dmp.patch_fromText(edit)
                    new_body, results = dmp.patch_apply(patches, base or "")
                    if all(results):
                        return new_body
                except Exception:
                    pass
            return edit

        pdf = pdf.sort_values(["block_num", "op_seq"])
        body = ""
        first = True
        for edit in pdf["body"]:
            if first:
                body = edit or ""
                first = False
            else:
                body = apply_one(body, edit)
        return _pd.DataFrame(
            {"authorperm": [pdf["authorperm"].iloc[0]], "body": [body]}
        )

    return (
        edits.select("authorperm", "block_num", "op_seq", "body")
        .groupBy("authorperm")
        .applyInPandas(fold_group, RESULT_SCHEMA)
    )
