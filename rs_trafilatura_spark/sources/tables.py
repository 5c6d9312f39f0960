"""Storage abstraction: the engine reads/writes Iceberg at cluster scale
(SURVEY.md §1.2 — input and output are Iceberg tables) and parquet paths
anywhere Iceberg's runtime jar isn't on the classpath (this container).

The format is a flag, not a code fork: both branches build the same
DataFrame plan, so partition pruning / column pushdown behave identically;
only the connector differs.  ``fmt=None`` auto-detects: catalog-style
``cat.db.table`` identifiers mean Iceberg, filesystem paths mean parquet.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

_TABLE_IDENT_RE = re.compile(r"^[A-Za-z_][\w]*(\.[A-Za-z_][\w]*){1,2}$")
_DATA_FILE_EXT = (".parquet", ".orc", ".json", ".csv", ".avro")


def detect_format(path: str) -> str:
    """Catalog identifiers (cat.db.table) mean Iceberg; anything that looks
    like a filesystem location — a separator, a data-file extension, or an
    existing local path like 'pages.parquet' in cwd — means parquet.

    An explicit ``iceberg:`` / ``parquet:`` scheme prefix overrides
    detection.  At scale prefer passing ``fmt`` explicitly (or a scheme):
    ``os.path.exists`` is driver-local, so a relative dataset path shaped
    like ``a.b.c`` that isn't visible on the driver would be misread as an
    Iceberg identifier, and a catalog identifier colliding with a local
    file would silently read parquet."""
    if ("/" in path or "\\" in path
            or path.lower().endswith(_DATA_FILE_EXT)
            or os.path.exists(path)):
        return "parquet"
    return "iceberg" if _TABLE_IDENT_RE.match(path) else "parquet"


def _split_scheme(path: str) -> tuple[Optional[str], str]:
    """Strip an explicit 'iceberg:'/'parquet:' scheme prefix if present."""
    for scheme in ("iceberg", "parquet"):
        if path.startswith(scheme + ":"):
            return scheme, path[len(scheme) + 1:]
    return None, path


def read_pages(spark: SparkSession, path: str,
               fmt: Optional[str] = None) -> DataFrame:
    """Scan the pages table.  Column pruning and predicate pushdown reach
    the scan in both formats (verify with .explain: PushedFilters /
    ReadSchema)."""
    scheme, path = _split_scheme(path)
    fmt = fmt or scheme or detect_format(path)
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    raise ValueError(f"unknown input format {fmt!r}")


def write_output(df: DataFrame, path: str, fmt: Optional[str] = None,
                 partition_by: Sequence[str] = ("stage",),
                 mode: str = "overwrite") -> None:
    """Write the extraction output partitioned (north rule: partitioned
    Iceberg tables out).  Default partition column is the cascade stage —
    low cardinality, and the first thing corpus audits filter on."""
    scheme, path = _split_scheme(path)
    fmt = fmt or scheme or detect_format(path)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "iceberg":
        writer.format("iceberg").save(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unknown output format {fmt!r}")


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg DataSource is registered on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False
