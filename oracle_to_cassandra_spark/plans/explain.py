"""Physical-plan inspection helpers (SURVEY.md §4).

The engine adds no custom Catalyst rules — the reference surface needs
none (§4: "Custom Catalyst rules needed: none"). What it DOES need is
*verification* that the declarative plans hit the optimizer paths the
100 TB design depends on: predicate pushdown into parquet scans,
column pruning (ReadSchema), and broadcast joins for dimensions.
These helpers parse ``explain("formatted")`` output so tests can
assert plan shape, not just result values.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """``explain("formatted")`` output, truncated to the CURRENT plan:
    once a DataFrame has executed, AQE appends an ``== Initial Plan ==``
    section that repeats every node block with DIFFERENT ids — any
    regex over the full text would then double-count nodes."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().split("== Initial Plan ==")[0]


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ReadSchema — the column-pruning
    witness."""
    plan = formatted_plan(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def cartesian_attach_violations(df: DataFrame, row_bound: int = 4096) -> list[str]:
    """Condition-less joins whose sides are BOTH statically unbounded.

    The repo-standard global-aggregate attach (``crossJoin(broadcast(
    one_row_agg))``) plans as a BroadcastNestedLoopJoin — benign
    exactly because one side is a 1-row aggregate (or a literal
    replicate spine): Catalyst's ``maxRows`` proves the bound. A future
    edit that turns one of these into a real cartesian (both sides
    data-sized) is the 100 TB catastrophe class, and it would still
    *pass the oracle* at test SF — so the bound is pinned structurally
    here (r13 verdict item 8). Two ways a join passes: a side Catalyst
    statically bounds (``maxRows`` ≤ ``row_bound``), or an explicit
    broadcast strategy hint (the IVF probes×centroids enumeration: both
    sides derived relations Catalyst can't bound, smallness declared by
    the author via ``F.broadcast``) — an *accidental* cartesian carries
    neither. Returns a description per violating join; empty list =
    every condition-less join is deliberately bounded."""
    bad: list[str] = []

    def _max_rows(node) -> int | None:
        mr = node.maxRows()
        return int(mr.get()) if mr.isDefined() else None

    def _walk(node) -> None:
        if node.nodeName() == "Join" and node.condition().isEmpty():
            bounds = [_max_rows(node.left()), _max_rows(node.right())]
            # JoinHint.toString renders the strategy lowercase, e.g.
            # "rightHint=(strategy=broadcast)" — matched verbatim (no
            # case fold: this is plan text, and the repo pins all
            # folding of DATA text to fold_text_py)
            hinted = "broadcast" in node.hint().toString()
            if not hinted and not any(
                b is not None and b <= row_bound for b in bounds
            ):
                bad.append(
                    f"condition-less Join with side bounds {bounds}, "
                    f"no broadcast hint: " + node.simpleString(100)
                )
        kids = node.children()
        for i in range(kids.size()):
            _walk(kids.apply(i))

    _walk(df._jdf.queryExecution().optimizedPlan())
    return bad


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan — the scale
    cost driver. Excluded: broadcast exchanges (move only the small
    side) and SinglePartition exchanges (the 1-row output of a global
    aggregate, e.g. a corpus count feeding a broadcast).

    Parsed from each Exchange node's own detail block (header
    ``(N) Exchange`` + its ``Arguments:`` line), keyed by node id —
    NOT by subtracting a global ``SinglePartition`` regex count from a
    global node count, which silently skews whenever a SinglePartition
    line belongs to some other node or a detail block is printed twice
    (AQE initial+final plan output repeats blocks with the same id)."""
    plan = formatted_plan(df)
    is_shuffle_by_id: dict[str, bool] = {}
    for block in re.split(r"\n\s*\n", plan):
        m = re.match(r"\((\d+)\) Exchange\b", block.strip())
        if not m:
            continue
        args = re.search(r"^Arguments: (.*)$", block, re.M)
        is_shuffle_by_id[m.group(1)] = not (
            args and args.group(1).startswith("SinglePartition")
        )
    return sum(is_shuffle_by_id.values())
