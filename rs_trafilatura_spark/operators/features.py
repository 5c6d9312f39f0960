"""Vectorized page-type feature extraction over a pages table: one Arrow
batch in, a fixed-width Float64 matrix out (array<double> x 89 per row) —
the input a downstream GBT/XGBoost scorer consumes (SURVEY.md §2.9)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

from ..kernel.ml_features import N_FEATURES

FEATURES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("features", T.ArrayType(T.DoubleType()), False),
])


def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..dom import Document
    from ..functions.encoding import transcode_to_utf8
    from ..kernel.ml_features import extract_ml_features

    for pdf in batches:
        feats = [
            extract_ml_features(Document(transcode_to_utf8(bytes(html))), url)
            for url, html in zip(pdf["url"], pdf["html"])
        ]
        yield pd.DataFrame({"url": pdf["url"], "features": feats})


def page_type_features(pages: DataFrame) -> DataFrame:
    """pages(url, html binary) -> (url, features: array<double>[89])."""
    return pages.select("url", "html").mapInPandas(
        feature_batches, schema=FEATURES_SCHEMA
    )


__all__ = ["N_FEATURES", "page_type_features"]
