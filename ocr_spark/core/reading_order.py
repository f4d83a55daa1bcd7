"""Reading-order sort + row clustering — the load-bearing ordering contract.

``sorted_boxes`` ports the reference's canonical reading order verbatim
(tools/infer/predict_system.py:114-138): sort by (y, x) of the top-left
corner, then a bounded bubble pass that swaps adjacent boxes whose y
difference is < 10px into left-to-right order.  The bubble pass is
order-dependent — do not "improve" it (SURVEY.md §7 hard part (a)).

Note: the reference has a special branch for exactly two boxes
(predict_system.py:123-124) that compares point *arrays* inside a tuple key
and cannot execute as written in modern numpy; this port applies the general
(y, x) sort for all sizes — the two-box outcome is identical whenever the
reference branch is well-defined.

``group_rows`` is the y-gap clustering used for table rows and line merging
(reference obj_det/ocr_context.py:427-449, threshold 10px;
apphelper/image.py:317-375 joins same-row groups with ' ').

A window-function SQL formulation of the same clustering lives in
operators/spans.py so the DuckDB oracle can cross-check it.
"""

from __future__ import annotations

from collections.abc import Sequence

Y_SAME_ROW_PX = 10  # reference predict_system.py:131 / ocr_context.py:430


def sorted_boxes(boxes: Sequence[tuple[int, int, int, int]]) -> list[int]:
    """Return the reading-order permutation of indices into ``boxes``.

    boxes are (x, y, w, h) with (x, y) the top-left corner.
    """
    order = sorted(range(len(boxes)), key=lambda i: (boxes[i][1], boxes[i][0]))
    n = len(order)
    for i in range(n - 1):
        for j in range(i, 0, -1):
            a, b = order[j], order[j + 1]
            if abs(boxes[b][1] - boxes[a][1]) < Y_SAME_ROW_PX and (
                boxes[b][0] < boxes[a][0]
            ):
                order[j], order[j + 1] = order[j + 1], order[j]
            else:
                break
    return order


def group_rows(
    boxes: Sequence[tuple[int, int, int, int]], order: Sequence[int]
) -> list[list[int]]:
    """Group an already reading-ordered index sequence into rows.

    CHAINED gap rule, ported verbatim from the reference's table-row
    clustering (ocr_context.py:436-440): boxes are walked in ascending y
    (ties broken by reading-order position) and each box is compared to
    its immediate y-PREDECESSOR — not to the row's first box — so a
    gradually drifting column (y = 0, 6, 12, ...) stays one row exactly as
    in the reference and in the lag-window SQL twin
    (operators/spans.py:row_cluster).  Within a row, boxes keep their
    reading-order sequence (the reference re-sorts by x-center,
    ocr_context.py:439; the bubble-sorted reading order is already
    left-to-right within a row).
    """
    pos = {idx: p for p, idx in enumerate(order)}
    ysorted = sorted(order, key=lambda i: (boxes[i][1], pos[i]))
    rows: list[list[int]] = []
    prev_y: int | None = None
    for idx in ysorted:
        y = boxes[idx][1]
        if prev_y is None or abs(y - prev_y) >= Y_SAME_ROW_PX:
            rows.append([idx])
        else:
            rows[-1].append(idx)
        prev_y = y
    return [sorted(r, key=pos.__getitem__) for r in rows]


def union_rows(
    boxes: Sequence[tuple[int, int, int, int]],
    alpha: float = 0.1,
) -> list[list[int]]:
    """union_rbox's RELATIVE row-merge criterion, ported from the
    reference (apphelper/image.py:317-375): walking the boxes in their
    given order, a box joins the latest group iff for EVERY member
    |cy_box - cy_member| / max(0.01, min(h_box, h_member) / 2) <= alpha;
    otherwise it starts a new group.  Groups are then x-center sorted.

    This is the mixed-text-size-aware sibling of group_rows: the
    threshold scales with the smaller glyph height (alpha=0.1 ⇒ 5% of
    the smaller height), so a 40px headline and an adjacent 12px footnote
    do not merge the way the fixed 10px rule would merge them.
    """
    groups: list[list[int]] = []
    for i, (x, y, w, h) in enumerate(boxes):
        cy = y + h / 2.0
        if groups:
            check = False
            for j in groups[-1]:
                xj, yj, wj, hj = boxes[j]
                cyj = yj + hj / 2.0
                if abs(cy - cyj) / max(0.01, min(h, hj) / 2.0) > alpha:
                    check = True
            if not check:
                groups[-1].append(i)
                continue
        groups.append([i])
    return [
        sorted(g, key=lambda i: boxes[i][0] + boxes[i][2] / 2.0)
        for g in groups
    ]


def reading_order_text(
    boxes: Sequence[tuple[int, int, int, int]], texts: Sequence[str]
) -> str:
    """Reading-ordered page text: same-row boxes joined by ' ', rows by '\\n'."""
    order = sorted_boxes(boxes)
    rows = group_rows(boxes, order)
    return "\n".join(" ".join(texts[i] for i in row) for row in rows)
