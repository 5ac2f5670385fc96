"""Document-corpus I/O: JSONL interchange and streaming sources.

JSONL (one JSON object per line) is the de-facto interchange format of
LLM training corpora. Scale rules encoded here:

- **Always pass an explicit schema.** Schema inference is a full extra
  pass over the data (at 100 TB, a second 100 TB scan) and can demote
  types on dirty rows; with a schema the read is one streaming pass
  and corrupt rows go to ``_corrupt_record`` instead of poisoning the
  frame.
- JSONL is line-splittable, so a directory of .jsonl(.gz with caveats:
  gzip is NOT splittable — one task per file; prefer zstd parquet or
  many smaller gz files) parallelizes by file splits.
- Parquet remains the processing format; JSONL is the edge format.
  ``jsonl_to_parquet`` is the one-pass converter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# the driver-testdata documents schema (TESTDATA.md)
DOCUMENTS_DDL = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType = DOCUMENTS_DDL,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL document corpus with an explicit schema (PERMISSIVE
    mode: malformed lines yield nulls + ``_corrupt_record`` when
    ``keep_corrupt``, instead of failing a 100 TB job on one bad
    line)."""
    reader = spark.read.schema(
        schema
        if not keep_corrupt
        else f"{schema}, _corrupt_record string"
    )
    return reader.option("mode", "PERMISSIVE").json(path)


def write_documents_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Export a document table as JSONL (one object per line, one file
    per partition — repartition first to control file count/size)."""
    df.write.mode(mode).json(path)


def jsonl_to_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    schema: str | StructType = DOCUMENTS_DDL,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """One-pass JSONL → parquet conversion (the edge→processing format
    hop). ``partition_by`` (e.g. ["lang"]) makes downstream per-lang
    filters partition-pruning directory skips."""
    df = read_documents_jsonl(spark, src, schema)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(dst)


def write_documents_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (zlib-compressed, Spark-native) — for downstream
    consumers standardized on the Hive/Trino side of the house. Same
    partition-pruning story as parquet: ``partition_by`` columns become
    directory keys."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_documents_orc(
    spark: SparkSession, path: str, schema: str | StructType | None = None
) -> DataFrame:
    """ORC source. ORC carries its schema in the file footer, so the
    schema argument is an optional *assertion* (pass it to fail fast on
    drift rather than discover it mid-pipeline); predicate pushdown and
    column pruning work as with parquet."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Small-files compaction: rewrite a parquet directory into files
    of ~``target_file_bytes`` each and return the output file count.

    The small-files problem is the classic operational failure of a
    continuously-fed table (every micro-batch appends a sliver; a year
    later the NameNode/listing and per-file open costs dominate the
    scan). File count = ceil(current_bytes / target); ``coalesce`` (a
    narrow dependency — no shuffle) merges splits down to that count.
    Compression changes the exact output size, but for compaction the
    goal is order-of-magnitude file count, not byte precision.

    Sizes and counts come from the Hadoop FileSystem API resolved from
    the path itself, so any URI Spark can read works — local, HDFS, or
    an object store — not just the local filesystem (ADVICE r2)."""
    import math

    def _fs_and_path(p: str):
        jpath = spark._jvm.org.apache.hadoop.fs.Path(p)
        return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath

    def _data_files(p: str):
        fs, jpath = _fs_and_path(p)
        it = fs.listFiles(jpath, True)
        while it.hasNext():
            st = it.next()
            if not st.getPath().getName().startswith(("_", ".")):
                yield st

    total = sum(st.getLen() for st in _data_files(src))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    df.coalesce(n_files).write.mode(mode).parquet(dst)
    return sum(
        1
        for st in _data_files(dst)
        if st.getPath().getName().endswith(".parquet")
    )


def read_document_stream(
    spark: SparkSession,
    path: str,
    schema: str | StructType = DOCUMENTS_DDL,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming document source (file-arrival micro-batches) — the
    continuous-ingest shape of a corpus pipeline. Stateless operators
    (pii_scrub, text_quality, lang_id, token_counts) apply unchanged;
    sampling/caps join against a STATIC rates/caps dim
    (stream-static broadcast join, no streaming state)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)
