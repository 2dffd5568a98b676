"""Physical plan reports.

At 100 TB the difference between a good and a bad plan is not visible in
a row-count test — it's visible in the plan: did the filter reach the
parquet scan (PushedFilters)? did the dim join broadcast instead of
shuffling the fact table? how many Exchanges does the query pay?

``plan_report`` parses ``df.explain("formatted")`` output into a small
struct the tests assert on, so plan regressions fail CI the same way
wrong answers do.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    text: str
    n_exchanges: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_bnl_joins: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    has_codegen: bool = False

    def scans_only_columns(self, *cols: str) -> bool:
        """True if every parquet scan reads a subset of the given columns
        (column pruning worked)."""
        allowed = set(cols)
        for rs in self.read_schemas:
            got = set(re.findall(r"(\w+):", rs))
            if not got <= allowed:
                return False
        return True


def plan_report(df: DataFrame) -> PlanReport:
    qe = df._jdf.queryExecution()  # noqa: SLF001
    jvm = df._sc._jvm  # noqa: SLF001
    text = jvm.PythonSQLUtils.explainString(qe, "formatted")
    # node occurrences counted from the detail headers "(N) NodeName",
    # not raw substring counts (the tree section would double-count)
    nodes = re.findall(r"^\(\d+\) (\w+)", text, flags=re.MULTILINE)
    # AQE's pre-execution "simple" plan hides codegen stars; "codegen"
    # mode reports the compiled WholeStageCodegen subtrees directly
    codegen = jvm.PythonSQLUtils.explainString(qe, "codegen")
    return PlanReport(
        text=text,
        n_exchanges=sum(n == "Exchange" for n in nodes),
        n_broadcast_joins=sum(n == "BroadcastHashJoin" for n in nodes),
        n_sortmerge_joins=sum(n == "SortMergeJoin" for n in nodes),
        n_bnl_joins=sum(n == "BroadcastNestedLoopJoin" for n in nodes),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", text),
        has_codegen="WholeStageCodegen" in codegen,
    )
