"""Tolerant JSON parsing (SURVEY.md §2.8 F8-F9).

The reference double-decodes JSON payloads — ``json.loads`` and, if the
result is still a string, ``json.loads`` again; invalid input degrades to
None/{} (reference: processors/custom_json_processor.py:20-30,
comment_processor_for_engine.py:54-64). Expressed with nested ``from_json``
so it stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StringType

_MAP = MapType(StringType(), StringType())
_STR_ARR = ArrayType(StringType())


def _decode_json_string_literal(col: Column) -> Column:
    """Decode a JSON string literal ('"...escaped..."') to its inner text by
    parsing it inside a one-element JSON array (from_json cannot target a
    bare STRING schema)."""
    wrapped = F.from_json(F.concat(F.lit("["), col, F.lit("]")), _STR_ARR)
    return F.try_element_at(wrapped, F.lit(1))


def tolerant_json_map(col: Column) -> Column:
    """Parse a JSON-object string to MAP<STRING,STRING>, tolerating one level
    of double-encoding ('"{\\"a\\":1}"') and returning NULL for garbage."""
    once = F.from_json(col, _MAP)
    twice = F.from_json(_decode_json_string_literal(col), _MAP)
    return F.coalesce(once, twice)


def json_str_field(col: Column, field: str) -> Column:
    """get_json_object with the double-decode fallback."""
    path = f"$.{field}"
    once = F.get_json_object(col, path)
    twice = F.get_json_object(_decode_json_string_literal(col), path)
    return F.coalesce(once, twice)


def extract_user(required_posting_auths: Column, required_auths: Column) -> Column:
    """First posting auth, else first active auth (reference:
    processors/custom_json_processor.py:33-47)."""
    return F.coalesce(
        F.try_element_at(required_posting_auths, F.lit(1)), F.try_element_at(required_auths, F.lit(1))
    )
