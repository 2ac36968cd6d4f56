"""faidx-style genome-size source (reference S10, cli.rs:281-298): a .fai
index is a TSV of (name, length, offset, linebases, linewidth); the genome
size is the sum of the length column — in Spark, a CSV scan + one sum."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAI_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("offset", T.LongType(), True),
        T.StructField("linebases", T.LongType(), True),
        T.StructField("linewidth", T.LongType(), True),
    ]
)


def genome_size_from_faidx(spark: SparkSession, path: str) -> int:
    df = spark.read.csv(path, sep="\t", schema=FAI_SCHEMA)
    row = df.agg(F.sum("length")).collect()[0]
    if row[0] is None:
        raise ValueError(f"empty or unreadable faidx file: {path}")
    return int(row[0])
