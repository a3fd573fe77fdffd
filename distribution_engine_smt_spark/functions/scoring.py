"""Ranking / reward-curve scalar functions as pure Column expressions.

These are the reference's scalar math utilities (reference:
engine/utils.py:25-46) re-expressed JVM-side — no UDFs, so they stay inside
whole-stage codegen and vectorize for free at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# timescales from the reference call sites
# (engine_comments_contract_processor.py:101-106: trend/promoted 480000, hot 10000)
SCORE_TIMESCALE_TREND = 480000
SCORE_TIMESCALE_HOT = 10000


def score(rshares: Column, created: Column, timescale: int) -> Column:
    """Reddit-style rank (reference: engine/utils.py:41-46):

        sign(rshares) * log10(max(abs(rshares), 1)) + epoch(created)/timescale

    NTZ-safe: epoch extraction goes through timestamp_diff, not a tz-sensitive
    double cast.
    """
    from .timeutils import epoch_seconds

    r = rshares.cast("double")
    magnitude = F.log10(F.greatest(F.abs(r), F.lit(1.0)))
    return F.signum(r) * magnitude + epoch_seconds(created).cast("double") / F.lit(
        float(timescale)
    )


def int_sqrt(x: Column) -> Column:
    """Integer sqrt (reference: engine/utils.py:25-26)."""
    return F.floor(F.sqrt(x.cast("double")))


def int_pow(x: Column, exp: Column) -> Column:
    """Integer pow (reference: engine/utils.py:29-30)."""
    return F.floor(F.pow(x.cast("double"), exp.cast("double")))


def convergent_linear(rshares: Column, s: Column) -> Column:
    """Convergent-linear reward curve (reference: engine/utils.py:33-34):
    ((r + s)^2 - s^2) / (r + 4s), floored to int."""
    r = rshares.cast("double")
    sd = s.cast("double")
    return F.floor(((r + sd) * (r + sd) - sd * sd) / (r + F.lit(4.0) * sd))


def convergent_square_root(rshares: Column, s: Column) -> Column:
    """Convergent-sqrt reward curve (reference: engine/utils.py:37-38):
    r / int_sqrt(r + 2s)."""
    r = rshares.cast("double")
    sd = s.cast("double")
    return F.floor(r / int_sqrt(r + F.lit(2.0) * sd).cast("double"))
