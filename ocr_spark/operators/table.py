"""Table-structure extraction as relational geometry.

The reference computes table cells as the interval intersection of
detected row strips x column strips (table_extract.py:221-250,
_generate_cells_from_rows_columns:449-490) and assigns raw cell
detections to (row, col) by bbox intersection (_classify_detections:
98-148, _organize_table_structure:151-218).  In the reference this runs
as tiny in-process numpy loops per image; here the same contracts are
expressed as Spark joins so they hold for millions of tables at once:

* ``table_cells`` — equi-join rows x columns on table_id (the grid
  product), cell bbox = strip intersection.
* ``table_det_assign`` — a *range join*: detections -> containing row
  strip and column strip.  Physically an equi-join on table_id with the
  interval predicate evaluated join-side, so both sides co-partition on
  table_id (one shuffle each) and no cross product ever materializes.

Inputs are synthesized deterministically from the events table in pure
SQL (same derivation in the DuckDB oracle — __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROW_H = 20  # row strip pitch; strip height 18 (2px gap)
COL_W = 30  # column strip pitch; strip width 27 (3px gap)


def _tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        (F.col("event_id") % 40).alias("table_id"), "event_id"
    ).groupBy("table_id").agg(F.count("*").alias("n_ev"))


def _row_strips(tables: DataFrame) -> DataFrame:
    t = F.col("table_id")
    return tables.select(
        "table_id", F.explode(F.sequence(F.lit(0), (t % 4 + 2).cast("int"))).alias("row")
    ).select(
        "table_id",
        "row",
        (F.col("row") * ROW_H + t % 7).alias("y0"),
        (F.col("row") * ROW_H + t % 7 + ROW_H - 2).alias("y1"),
    )


def _col_strips(tables: DataFrame) -> DataFrame:
    t = F.col("table_id")
    return tables.select(
        "table_id", F.explode(F.sequence(F.lit(0), (t % 5 + 2).cast("int"))).alias("col")
    ).select(
        "table_id",
        "col",
        (F.col("col") * COL_W + t % 5).alias("x0"),
        (F.col("col") * COL_W + t % 5 + COL_W - 3).alias("x1"),
    )


def table_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell grid = row strips x column strips per table; bbox is the
    strip intersection (_calculate_cell_from_row_column contract)."""
    tables = _tables(spark, sf_dir)
    cells = _row_strips(tables).join(_col_strips(tables), "table_id")
    return cells.select(
        "table_id", "row", "col", "x0", "y0", "x1", "y1"
    ).repartition(1).sortWithinPartitions("table_id", "row", "col")


def table_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows -> HTML render (reference _convert_rows_to_html,
    obj_det/ocr_context.py:330-357): cell texts joined into
    <table><tr><td> markup, entirely with collect_list/array_join."""
    cells = table_cells(spark, sf_dir).select(
        "table_id", "row", "col",
        F.concat_ws("-", "row", "col").alias("cell_text"),
    )
    rows = cells.groupBy("table_id", "row").agg(
        F.concat(
            F.lit("<tr>"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("col", "cell_text"))),
                    lambda s: F.concat(
                        F.lit("<td>"), s["cell_text"], F.lit("</td>")
                    ),
                ),
                "",
            ),
            F.lit("</tr>"),
        ).alias("row_html")
    )
    return rows.groupBy("table_id").agg(
        F.concat(
            F.lit("<table>"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("row", "row_html"))),
                    lambda s: s["row_html"],
                ),
                "",
            ),
            F.lit("</table>"),
        ).alias("html")
    ).repartition(1).sortWithinPartitions("table_id")


def table_det_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign point detections to their containing (row, col) strip — the
    _classify_detections interval-intersection as a co-partitioned range
    join; detections falling in gaps between strips drop out (the
    reference's unmatched detections are likewise discarded)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dets = ev.select(
        (F.col("event_id") % 40).alias("table_id"),
        F.col("event_id").alias("det_id"),
        ((F.col("event_id") * 13) % 120).alias("x"),
        ((F.col("event_id") * 11) % 100).alias("y"),
    )
    tables = _tables(spark, sf_dir)
    rows = _row_strips(tables)
    cols = _col_strips(tables)
    with_row = dets.join(rows, "table_id").filter(
        (F.col("y") >= F.col("y0")) & (F.col("y") <= F.col("y1"))
    )
    assigned = with_row.select("table_id", "det_id", "x", "row").join(
        cols, "table_id"
    ).filter((F.col("x") >= F.col("x0")) & (F.col("x") <= F.col("x1")))
    return assigned.select("table_id", "det_id", "row", "col").repartition(1).sortWithinPartitions(
        "table_id", "det_id"
    )
