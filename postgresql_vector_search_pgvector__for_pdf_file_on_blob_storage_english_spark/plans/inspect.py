"""Physical-plan introspection — the "did Catalyst build the plan we
want?" toolkit.

At 100 TB the plan *is* the performance model: a scan that reads all
columns, a join that didn't broadcast, or a sort that isn't top-k each
turn into hours.  These helpers make plan shape assertable in tests, so
regressions in pushdown/broadcast/top-k/shuffle-count fail CI instead
of fleet budgets.  (SURVEY.md §4 lists which techniques are expected
where; tests/test_plans.py pins them.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def _simple(df: DataFrame) -> str:
    return explain_str(df, "simple")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = _simple(df)
    return len(re.findall(r"Exchange (?!SinglePartition)(?:hashpartitioning|rangepartitioning|RoundRobinPartitioning)", plan))


def has_take_ordered(df: DataFrame) -> bool:
    """True when ORDER BY + LIMIT planned as top-k (TakeOrderedAndProject),
    i.e. per-partition heaps, k rows to the driver, no full sort."""
    return "TakeOrderedAndProject" in _simple(df)


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in _simple(df) or "BroadcastNestedLoopJoin" in _simple(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists from every scan in the formatted plan."""
    plan = explain_str(df, "formatted")
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def partition_filters(df: DataFrame) -> list[str]:
    """The PartitionFilters lists from every scan — the partition-pruning
    witness: a filter here eliminates whole directories before any I/O,
    unlike PushedFilters which still opens files."""
    plan = explain_str(df, "formatted")
    return re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the column-pruning witness."""
    plan = explain_str(df, "formatted")
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """How many WholeStageCodegen subtrees the plan compiled to.

    Uses the ``codegen`` explain mode because AQE's pre-execution plan
    (``isFinalPlan=false``) omits the ``*(N)`` stage markers."""
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", explain_str(df, "codegen"))
    return int(m.group(1)) if m else 0
