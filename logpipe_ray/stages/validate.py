"""Declarative data-validation gate (expectation checks).

A rule list compiles to vectorized Arrow predicates; one streaming
pass emits per-batch (rule, n_rows, n_violations) integer partials and
one tiny keyed sum produces the report — the shuffle is O(rules x
blocks) whatever the data volume, and every count is exact, so the
report is hash-reproducible against a SQL replay.

A row VIOLATES a rule when the rule's predicate is FALSE **or NULL**
(null-hostile: a null value fails a range/set/regex check; use an
explicit ``not_null`` rule to report nullness itself). This matches
``NOT coalesce(pred, FALSE)`` in SQL.

Rule forms (dicts; ``name`` defaults to ``check:col``):
    {"col": "event_id", "check": "not_null"}
    {"col": "value", "check": "between", "lo": 0, "hi": 250}
    {"col": "event_type", "check": "in_set", "values": [...]}
    {"col": "props", "check": "regex", "pattern": r"^\\{"}
    {"col": "value", "check": "predicate", "fn": callable(Table)->BooleanArray}

The reference engine validates per-record inside its transformers
(malformed-line skip, `reference/src/parsers/*.js` error counters);
this stage is the batch-columnar generalization: a declarative,
schema-level contract over any Dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum


def _compile(rule: dict):
    col = rule["col"]
    check = rule["check"]
    name = rule.get("name", f"{check}:{col}")

    if check == "not_null":
        def pred(t: pa.Table):
            return pc.is_valid(t[col])
    elif check == "between":
        lo, hi = rule["lo"], rule["hi"]

        def pred(t: pa.Table):
            return pc.and_(
                pc.greater_equal(t[col], lo), pc.less_equal(t[col], hi)
            )
    elif check == "in_set":
        vals = pa.array(rule["values"])

        def pred(t: pa.Table):
            return pc.is_in(t[col], value_set=vals)
    elif check == "regex":
        pat = rule["pattern"]

        def pred(t: pa.Table):
            return pc.match_substring_regex(t[col], pat)
    elif check == "predicate":
        fn = rule["fn"]

        def pred(t: pa.Table):
            return fn(t)
    else:
        raise ValueError(f"unknown check {check!r}")

    return name, pred


def validation_report(ds: Dataset, rules: list[dict]) -> Dataset:
    """Evaluate every rule over every row; return one row per rule:
    (rule, n_rows, n_violations), exact counts, sorted by the caller
    if needed. Violation = predicate FALSE or NULL."""
    compiled = [_compile(r) for r in rules]
    names = [n for n, _ in compiled]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")

    def partial(t: pa.Table) -> pa.Table:
        viols = []
        for _, pred in compiled:
            ok = pc.fill_null(pred(t), False)
            viols.append(t.num_rows - (pc.sum(ok).as_py() or 0))
        return pa.table(
            {
                "rule": pa.array(names, pa.string()),
                "n_rows": pa.array(
                    np.full(len(names), t.num_rows, np.int64)
                ),
                "n_violations": pa.array(viols, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("rule")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_violations", alias_name="n_violations"),
        )
    )
