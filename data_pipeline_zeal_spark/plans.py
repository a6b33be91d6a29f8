"""Physical-plan introspection utilities.

The engine's performance contract is structural: filters reach the parquet
scan, projections prune columns, small dimensions broadcast, hot expressions
stay inside whole-stage codegen.  These helpers extract that structure from
the executed plan so tests and tuning sessions can ASSERT it instead of
eyeballing ``explain`` output.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0  # BroadcastNestedLoopJoin + CartesianProduct
    shuffles: int = 0
    #: global single-reducer exchanges — an unpartitioned Window (ntile over
    #: the whole frame) or a global aggregate sink.  Benign when the input
    #: is a handful of partial-agg rows; a scale smell when row-level data
    #: funnels through it.
    single_partition_exchanges: int = 0
    #: Window operators fed by an Exchange SinglePartition — the
    #: "WindowExec: No Partition Defined" shape where EVERY input row moves
    #: to one task and sorts there.  The scale-killer, counted precisely.
    global_windows: int = 0
    codegen_stages: int = 0
    has_take_ordered: bool = False
    has_partial_agg: bool = False

    def scans_column(self, col: str) -> bool:
        return any(col in s for s in self.read_schemas)


def explain_mode(df: DataFrame, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    jmode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return qe.explainString(jmode)


def _count_global_windows(simple: str) -> int:
    """Count Window operators whose input exchange is SinglePartition —
    i.e. unpartitioned windows that sort the whole frame on one reducer.
    In the simple tree a Window's input appears on the following lines
    (Window / +- Sort / +- Exchange SinglePartition), so the first
    Exchange below each Window line is the one feeding it."""
    def _depth(line: str) -> int:
        m = re.search(r"[A-Za-z*]", line)
        return m.start() if m else len(line)

    lines = simple.splitlines()
    n = 0
    for i, ln in enumerate(lines):
        if re.search(r"\bWindow\b", ln):
            d = _depth(ln)
            for nxt in lines[i + 1 :]:
                if _depth(nxt) <= d:
                    break  # left the Window's subtree (sibling branch)
                if "Exchange" in nxt:
                    if "SinglePartition" in nxt:
                        n += 1
                    break
                if re.search(r"\bWindow\b", nxt):
                    break  # a nested window owns the next exchange
    return n


def summarize(df: DataFrame) -> PlanSummary:
    s = explain_mode(df, "formatted")
    # codegen stage markers only appear in the simple-mode tree
    simple = explain_mode(df, "simple")
    return PlanSummary(
        pushed_filters=[
            m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", s) if m
        ],
        read_schemas=re.findall(r"ReadSchema: ([^\n]*)", s),
        # operator counts come from the simple tree (one line per operator;
        # formatted mode repeats each operator in its details section)
        broadcast_joins=simple.count("BroadcastHashJoin"),
        sort_merge_joins=simple.count("SortMergeJoin"),
        nested_loop_joins=simple.count("BroadcastNestedLoopJoin")
        + simple.count("CartesianProduct"),
        shuffles=len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)", simple)),
        single_partition_exchanges=simple.count("Exchange SinglePartition"),
        global_windows=_count_global_windows(simple),
        codegen_stages=len(set(re.findall(r"WholeStageCodegen \((\d+)\)", simple))),
        has_take_ordered="TakeOrderedAndProject" in simple,
        has_partial_agg="partial_" in simple,
    )
