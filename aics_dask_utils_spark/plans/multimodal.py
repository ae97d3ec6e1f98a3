"""Multimodal plans (E3, E10): binary-column metadata, oracle-checked.

The decode/slice/sink pipeline itself is exercised in
``tests/test_multimodal.py`` over generated FAKEIMG binary files (the
driver tables carry no media bytes); here we verify the binary-cell
semantics DuckDB can also compute: byte length, sha256, magic bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import binary_meta
from ..sources import load_table
from . import register


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))                 AS byte_len,
           sha256(text)                               AS sha256_hex,
           lower(hex(encode(substring(text, 1, 8))))  AS magic_hex
    FROM documents
    """,
    doc="binary-column metadata pass: size/sha256/magic over opaque bytes "
    "(E10); text cast to binary stands in for media bytes",
    tags=("multimodal",),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    return binary_meta(docs).select("doc_id", "byte_len", "sha256_hex", "magic_hex")
