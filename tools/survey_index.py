"""Regenerate SURVEY.md §8.1 — the driver-board index mapping every
``__spark_entry__.queries()`` key to its implementation ``file:line``.

Run after adding/moving operators:  python tools/survey_index.py
(The index is derived, never hand-edited; line numbers rot whenever a
def moves, so regeneration is the only maintenance.)
"""

from __future__ import annotations

import importlib.util
import inspect
import sys

MARK = "### §8.1 Driver-board index"


def main() -> int:
    sys.path.insert(0, ".")
    spec = importlib.util.spec_from_file_location("se", "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs, osql = m.queries(), m.oracle_sql()
    # rows-only queries (driver records the weaker check): allowed only
    # for genuinely non-SQL-expressible ops — the pixel pipeline cannot
    # run inside DuckDB (eval_end2end_pipeline scores LIVE predictions).
    ROWS_ONLY = {"eval_end2end_pipeline"}
    assert set(qs) - set(osql) == ROWS_ONLY, sorted(
        (set(qs) ^ set(osql)) - ROWS_ONLY
    )

    rows = []
    for k in sorted(qs):
        f = qs[k]
        try:
            if hasattr(f, "__wrapped__"):
                f = f.__wrapped__
            src = (inspect.getsourcefile(f) or "?").replace(
                "/root/repo/", ""
            )
            line = inspect.getsourcelines(f)[1]
        except (TypeError, OSError):
            src, line = "__spark_entry__.py", "?"
        mark = "R (rows-only)" if k in ROWS_ONLY else "O"
        rows.append(f"| `{k}` | `{src}:{line}` | {mark} |")

    with open("SURVEY.md") as fh:
        head = fh.read().split(MARK)[0].rstrip() + "\n"
    body = "\n".join(
        [
            "",
            MARK + " (every `queries()` key → implementation)",
            "",
            "Derived by `tools/survey_index.py`; \"O\" = DuckDB value"
            " oracle in",
            "`oracle_sql()` (media/OCR expecteds are persisted fixture"
            " ground truth,",
            "same gate); \"R\" = rows-only by design (the live pixel"
            " pipeline cannot",
            "run inside DuckDB).  Regenerate after moving operators.",
            "",
            f"{len(rows)} queries on the board.",
            "",
            "| query | implementation | oracle |",
            "|---|---|---|",
        ]
        + rows
    )
    with open("SURVEY.md", "w") as fh:
        fh.write(head + body + "\n")
    print(f"{len(rows)} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
