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

    A new row starts when the y distance to the current row's anchor (its
    first box) reaches the 10px threshold — the same gap rule as the
    reference's table-row clustering (ocr_context.py:427-449).
    """
    rows: list[list[int]] = []
    anchor_y: int | None = None
    for idx in order:
        y = boxes[idx][1]
        if anchor_y is None or abs(y - anchor_y) >= Y_SAME_ROW_PX:
            rows.append([idx])
            anchor_y = y
        else:
            rows[-1].append(idx)
    return rows


def reading_order_text(
    boxes: Sequence[tuple[int, int, int, int]], texts: Sequence[str]
) -> str:
    """Reading-ordered page text: same-row boxes joined by ' ', rows by '\\n'."""
    order = sorted_boxes(boxes)
    rows = group_rows(boxes, order)
    return "\n".join(" ".join(texts[i] for i in row) for row in rows)
