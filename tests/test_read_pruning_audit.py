"""Registry-wide read-pruning audit (round-4 verdict item 8): every
parquet read in every query module must project columns at the reader
(`_read(..., columns=[...])` / `pq.read_table(..., columns=[...])`).
At 100 TB an unpruned read of a wide table ships every column off
storage for a two-column transform — this pins the discipline
mechanically instead of by review."""

from __future__ import annotations

import ast
import glob
import os

# tables narrow enough that a full read is the whole table anyway
NARROW_TABLES = {"region", "nation"}

QUERY_DIR = os.path.join(
    os.path.dirname(__file__), "..", "basicocr_ray", "pipelines", "queries"
)


def _read_calls(tree):
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            fn = node.func
            name = getattr(fn, "id", None) or getattr(fn, "attr", None)
            if name in ("_read", "read_table", "read_parquet"):
                yield name, node


def test_every_registry_read_is_column_pruned():
    offenders = []
    for path in sorted(glob.glob(os.path.join(QUERY_DIR, "*.py"))):
        tree = ast.parse(open(path).read())
        for name, call in _read_calls(tree):
            kwargs = {k.arg for k in call.keywords}
            has_filter = bool({"filter", "filters"} & kwargs)
            # positional columns: _read(sf, table, cols) / read_table(p, cols)
            has_columns = "columns" in kwargs or (
                name == "_read" and len(call.args) >= 3
            )
            if has_columns or has_filter:
                continue
            # allow unpruned reads of narrow tables only
            table = None
            if name == "_read" and len(call.args) >= 2 and isinstance(
                call.args[1], ast.Constant
            ):
                table = call.args[1].value
            elif name == "read_table" and call.args:
                # pq.read_table(_p(sf_dir, "table")) — resolve via _p
                a0 = call.args[0]
                if (
                    isinstance(a0, ast.Call)
                    and getattr(a0.func, "id", None) == "_p"
                    and len(a0.args) >= 2
                    and isinstance(a0.args[1], ast.Constant)
                ):
                    table = a0.args[1].value
            if table in NARROW_TABLES:
                continue
            offenders.append(
                f"{os.path.basename(path)}:{call.lineno} {name}({table or '?'})"
            )
    assert not offenders, (
        "unpruned parquet reads (add columns=[...]):\n" + "\n".join(offenders)
    )
