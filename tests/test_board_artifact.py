"""Sweep-last invariant: the committed full-board correctness artifact
must cover exactly the current queries() board (VERDICT r4 #1)."""

from __future__ import annotations


def test_board_artifact_covers_every_query():
    """Sweep-last invariant (VERDICT r4 §next-round #1): the committed
    full-board correctness artifact must cover EXACTLY the current
    ``queries()`` board — a query added after the sweep ran has no
    committed correctness row, and a removed query leaves a stale one.
    Regenerate with
    ``python tools/check_correctness.py --json CHECK_FULL_r05.json``
    whenever the board changes; the sweep must be the round's last
    commit."""
    import json
    import pathlib
    import re as _re

    root = pathlib.Path(__file__).resolve().parents[1]
    arts = sorted(
        root.glob("CHECK_FULL_r*.json"),
        key=lambda p: int(_re.search(r"r(\d+)", p.name).group(1)),
    )
    assert arts, "no CHECK_FULL_r*.json board artifact committed"
    art = arts[-1]
    payload = json.loads(art.read_text())
    recorded = set(payload["queries"].keys())

    import __spark_entry__ as entrymod

    board = set(entrymod.queries().keys())
    missing = sorted(board - recorded)
    stale = sorted(recorded - board)
    assert not missing and not stale, (
        f"{art.name} drifted from the board: "
        f"missing rows for {missing}; stale rows for {stale}"
    )