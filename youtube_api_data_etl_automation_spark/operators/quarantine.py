"""Bad-record quarantine: split a batch into (good, quarantined) with
first-failure attribution — the production-ETL robustness pattern.

The reference pipeline crashes outright on malformed rows (NULL duration →
isodate TypeError, fetch_youtube_data.py:184-186; NULL views → astype
crash, :171). The engine's scalar layer already maps malformed → NULL
(SURVEY.md §2.6); this operator adds the other half: route rows that fail
validation rules to a quarantine sink WITH the rule that rejected them,
instead of silently nulling or killing the job.

Shape: rules evaluate as ONE projected CASE chain (first failing rule wins,
same attribution style as corpus_filter_report), then one filter per output.
Both outputs share the scan; no shuffle, no UDF. At 100 TB the quarantine
side is written alongside the good side in the same pass and replayed after
fixes — the job never dies on data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REASON = "_quarantine_reason"


def quarantine_split(
    df: DataFrame, rules: Sequence[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` by validation ``rules`` = [(name, passes_condition)].

    Returns (good, quarantined): good rows pass every rule and keep the
    input schema; quarantined rows carry ``quarantine_reason`` — the name
    of the FIRST rule they failed (rule order is the attribution order).
    """
    reason = F.lit(None).cast("string")
    for name, cond in reversed(rules):
        # Three-valued logic: a rule evaluating to NULL (e.g. `value > 0`
        # on a NULL value) is a FAILURE, not a pass — coalesce to false
        # before negating, else NULL-condition rows sail into `good`.
        reason = F.when(~F.coalesce(cond, F.lit(False)), F.lit(name)).otherwise(
            reason
        )
    tagged = df.withColumn(_REASON, reason)
    good = tagged.filter(F.col(_REASON).isNull()).drop(_REASON)
    bad = tagged.filter(F.col(_REASON).isNotNull()).withColumnRenamed(
        _REASON, "quarantine_reason"
    )
    return good, bad
