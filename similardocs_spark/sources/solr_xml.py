"""Solr-style XML document source (reference S1/S2/S3).

The reference lazily streams `<add><doc><field name=...>` dumps
(IahxXmlParser.scala:26-215), gated by a SAX well-formedness check that skips
whole files on error (CheckXml.scala:33-55, used LuceneIndexAkka.scala:177-179),
over a sorted, regex-filtered directory listing (LuceneIndexAkka.scala:98-108).

Spark-native shape: a distributed text scan + per-partition streaming parse in
an Arrow-batched mapInPandas (files split by <doc> boundaries driver-side is
unnecessary: each file is parsed whole inside one task via wholeTextFiles-like
reads — XML dumps are many files, parallelism comes from the file count, the
same unit the reference's actor pool used). Malformed files are counted and
skipped, not failed.
"""
from __future__ import annotations

import glob
import os
import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

FIELD_SCHEMA = "file string, doc_idx long, field string, value string"


def list_xml_files(xml_dir: str, pattern: str = r".*\.xml$") -> list[str]:
    """Sorted, regex-filtered enumeration (LuceneIndexAkka.scala:98-108)."""
    rx = re.compile(pattern)
    return sorted(
        p for p in glob.glob(os.path.join(xml_dir, "*")) if rx.match(os.path.basename(p))
    )


def read_solr_xml(
    spark: SparkSession, xml_dir: str, pattern: str = r".*\.xml$"
) -> DataFrame:
    """→ long-form DataFrame (file, doc_idx, field, value); one row per field
    occurrence. Malformed files yield zero rows (the reference skips them)."""
    files = list_xml_files(xml_dir, pattern)
    paths = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        max(1, min(len(files), spark.sparkContext.defaultParallelism))
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"file": [], "doc_idx": [], "field": [], "value": []}
            for path in pdf["path"]:
                try:
                    tree = ET.parse(path)  # well-formedness gate (S2)
                except ET.ParseError:
                    continue
                for i, doc in enumerate(tree.getroot().iter("doc")):
                    for fld in doc.iter("field"):
                        rows["file"].append(os.path.basename(path))
                        rows["doc_idx"].append(i)
                        rows["field"].append(fld.get("name", ""))
                        rows["value"].append(fld.text or "")
            yield pd.DataFrame(rows)

    return paths.mapInPandas(parse, schema=FIELD_SCHEMA)


def solr_docs_to_transcripts(fields: DataFrame, text_fields: set[str]) -> DataFrame:
    """Adapter: long-form Solr fields → input_hint transcript shape, treating
    each indexed-field occurrence as one turn of a per-document conversation
    (mirrors the reference's catenation of all field values into `_indexed_`,
    LuceneIndexAkka.scala:279-295)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ids = fields.filter(F.col("field") == "id").select(
        "file", "doc_idx", F.col("value").alias("conv_id")
    )
    texts = fields.filter(F.col("field").isin(sorted(text_fields)))
    w = Window.partitionBy("file", "doc_idx").orderBy("field", "value")
    return (
        texts.join(ids, ["file", "doc_idx"])
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .select(
            "conv_id",
            "turn_idx",
            F.lit("user").alias("role"),
            F.col("value").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.lit(None).cast("timestamp").alias("ts"),
        )
    )
