"""OFD (电子发票) ingestion: zip container -> OFD.xml CustomData fields.

Reference contract: util/ofd_util.py:8-44 — unzip the OFD container,
parse ``OFD.xml``, and collect the ``ofd:CustomDatas`` entries into a
flat dict.  Here the whole path runs as one vectorized stage over a
binary column (zipfile + minidom are pure-python but cheap relative to
Arrow transfer; documents are small).

The fixture payloads are synthesized deterministically from order rows,
so the extraction output is value-checkable against a DuckDB oracle that
computes the same fields directly from the orders table — a true
roundtrip test of the container/XML codec path.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator
from xml.dom import minidom

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pipeline import _default_partitions

OFD_FIELDS = [
    "InvoiceCode", "InvoiceNo", "TotalAmount", "IssueDate", "Buyer", "Seller",
]
_OUT_SCHEMA = "o_orderkey long, " + ", ".join(f"{f} string" for f in OFD_FIELDS)


def build_ofd_bytes(fields: dict[str, str]) -> bytes:
    """One OFD container: zip with OFD.xml carrying CustomData entries."""
    entries = "".join(
        f'    <ofd:CustomData Name="{k}">{v}</ofd:CustomData>\n'
        for k, v in fields.items()
    )
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<ofd:OFD xmlns:ofd="http://www.ofdspec.org/2016">\n'
        "  <ofd:CustomDatas>\n" + entries + "  </ofd:CustomDatas>\n"
        "</ofd:OFD>\n"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("OFD.xml", xml)
        z.writestr("Doc_0/placeholder.xbrl", "")  # container shape
    return buf.getvalue()


def parse_ofd_bytes(payload: bytes) -> dict[str, str]:
    """The reference get_info contract: OFD.xml CustomDatas -> dict."""
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        xml = z.read("OFD.xml")
    dom = minidom.parseString(xml)
    out: dict[str, str] = {}
    for node in dom.getElementsByTagName("ofd:CustomData"):
        name = node.getAttribute("Name")
        value = node.firstChild.nodeValue if node.firstChild else ""
        out[name] = value
    return out


def _expected_fields_row(okey, custkey, total, date) -> dict[str, str]:
    return {
        "InvoiceCode": f"{okey % 10**12:012d}",
        "InvoiceNo": f"{custkey % 10**8:08d}",
        "TotalAmount": f"{round(total, 2):.2f}",
        "IssueDate": date.strftime("%Y-%m-%d"),
        "Buyer": f"buyer-{custkey}",
        "Seller": f"seller-{okey % 97}",
    }


def ofd_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: synthesize OFD containers from sampled orders,
    then extract the CustomData fields back out via the zip/XML codec.
    The oracle recomputes the fields directly from orders in SQL."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderkey") % 100 == 0
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for okey, ckey, total, date in zip(
                pdf["o_orderkey"], pdf["o_custkey"],
                pdf["o_totalprice"], pdf["o_orderdate"],
            ):
                payload = build_ofd_bytes(
                    _expected_fields_row(int(okey), int(ckey), float(total), date)
                )
                got = parse_ofd_bytes(payload)
                rows.append([int(okey)] + [got.get(f, "") for f in OFD_FIELDS])
            yield pd.DataFrame(rows, columns=["o_orderkey"] + OFD_FIELDS)

    return (
        orders.repartition(_default_partitions(spark))
        .mapInPandas(_roundtrip, schema=_OUT_SCHEMA)
        .repartition(1)
        .sortWithinPartitions("o_orderkey")
    )
