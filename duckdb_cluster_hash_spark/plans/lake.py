"""Lakehouse file-format operations: round-trips, compaction, schema
evolution, merge-on-read, dynamic overwrite, z-order.

Split out of the original plans/catalog.py; the registry, driver
window, and rotation stay in catalog.py.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from duckdb_cluster_hash_spark.plans._registry import _money_sum, _t, query


@query(
    "formats_csv_roundtrip",
    oracle=(
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price "
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
)
def formats_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink (B11 beyond parquet), graded by the oracle: write
    orders out as headered CSV, read it back with an explicit schema, and
    aggregate — doubles survive because Spark writes the shortest decimal
    repr and parses it back to the identical bits."""
    import os as _os
    import tempfile as _tf

    path = _os.path.join(
        _tf.gettempdir(), f"dch_csv_{_os.path.basename(sf_dir.rstrip('/'))}"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    orders.write.mode("overwrite").option("header", "true").csv(path)
    back = (
        spark.read.schema("o_orderpriority string, o_totalprice double")
        .option("header", "true")
        .csv(path)
    )
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "formats_json_roundtrip",
    oracle=(
        "SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts, "
        "CAST(min(p_size) AS INTEGER) AS min_size, "
        "CAST(max(p_size) AS INTEGER) AS max_size "
        "FROM part GROUP BY p_brand ORDER BY p_brand"
    ),
)
def formats_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink (B11), graded by the oracle: part rows out
    as JSONL, read back with an explicit schema, aggregated."""
    import os as _os
    import tempfile as _tf

    path = _os.path.join(
        _tf.gettempdir(), f"dch_json_{_os.path.basename(sf_dir.rstrip('/'))}"
    )
    part = _t(spark, sf_dir, "part").select("p_brand", "p_size")
    part.write.mode("overwrite").json(path)
    back = spark.read.schema("p_brand string, p_size int").json(path)
    return (
        back.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )
        .orderBy("p_brand")
    )


@query(
    "formats_orc_roundtrip",
    oracle=(
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lines, "
        "CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
)
def formats_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink (B11 beyond parquet/csv/json): write a lineitem
    projection as ORC, read it back, aggregate.  DuckDB cannot read ORC,
    so the oracle aggregates the ORIGINAL parquet — equality of the two
    rollups is exactly the losslessness claim (ORC stores int64/double
    natively, so the round-trip is bit-exact).

    Scale: ORC writes are per-partition and parallel like parquet; the
    read-back scan keeps pushdown/pruning (ORC is a first-class Spark
    columnar source with its own predicate pushdown).
    """
    import os as _os
    import tempfile as _tf

    from duckdb_cluster_hash_spark.sources.formats import read_table, write_table

    path = _os.path.join(
        _tf.gettempdir(), f"dch_orc_{_os.path.basename(sf_dir.rstrip('/'))}"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    write_table(li, path, format="orc")
    back = read_table(
        spark,
        path,
        format="orc",
        schema="l_returnflag string, l_quantity double, l_extendedprice double",
    )
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "formats_text_roundtrip",
    oracle=(
        "WITH lines AS (SELECT regexp_replace(text, '[\r\n]', ' ', 'g') "
        "AS text FROM documents) "
        "SELECT CAST(count(*) AS BIGINT) AS n_lines, "
        "CAST(count(DISTINCT text) AS BIGINT) AS distinct_lines, "
        "CAST(sum(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT) AS total_tokens "
        "FROM lines"
    ),
)
def formats_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-text source/sink (B11 — the canonical LLM-corpus input format):
    write each document as one line of a text dataset, read it back with
    ``spark.read.text``, and aggregate line/token stats.  Line order and
    ids are not preserved by the format, so the rollup is order- and
    id-free; equality with the oracle (computed on the original parquet)
    proves the round-trip is content-lossless.

    Structural on ANY corpus, not just today's: newlines are flattened
    to spaces with the identical regex on both engines BEFORE the sink
    write (a raw ``\\n`` would split one document into two lines and
    break line = document silently on corpus drift), and tokens are
    counted with the same ``[^ ]+`` regex on both sides
    (``split(value, ' ')`` would count empty strings under
    consecutive/leading spaces; ``[^ ]+`` cannot).
    """
    import os as _os
    import tempfile as _tf

    path = _os.path.join(
        _tf.gettempdir(), f"dch_text_{_os.path.basename(sf_dir.rstrip('/'))}"
    )
    docs = _t(spark, sf_dir, "documents")
    docs.select(
        F.regexp_replace(F.col("text"), "[\r\n]", " ").alias("value")
    ).write.mode("overwrite").text(path)
    back = spark.read.text(path)
    return back.agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("value").alias("distinct_lines"),
        F.sum(F.regexp_count("value", F.lit("[^ ]+"))).cast("bigint").alias("total_tokens"),
    )


@query(
    "formats_schema_evolution",
    oracle=(
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_with_lang, "
        "CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_null_lang, "
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
        "FROM documents"
    ),
)
def formats_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet generations (B11's data-lake
    reality: yesterday's files lack today's columns): generation 1 files
    carry (doc_id, n_chars), generation 2 adds ``lang``; a mergeSchema
    read unions both into one frame where the missing column is NULL for
    old rows.  The rollup proves the union is lossless (row count, char
    sum) and the NULL fill lands exactly on the old generation.

    Scale: mergeSchema's footer reconciliation is a planning-time cost
    on file metadata only; the data path stays a plain pruned columnar
    scan per generation — this is the zero-rewrite migration story for
    a 100 TB corpus gaining a column.
    """
    import os as _os
    import tempfile as _tf

    base = "".join(
        c if c.isalnum() else "_" for c in _os.path.basename(sf_dir.rstrip("/"))
    )
    root = _os.path.join(_tf.gettempdir(), f"dch_schema_evo_{base}")
    docs = _t(spark, sf_dir, "documents")
    docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars").write.mode(
        "overwrite"
    ).parquet(_os.path.join(root, "gen1"))
    docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", "n_chars", "lang"
    ).write.mode("overwrite").parquet(_os.path.join(root, "gen2"))
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(root)
    )
    return merged.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.col("lang").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_with_lang"),
        F.sum(F.col("lang").isNull().cast("bigint"))
        .cast("bigint")
        .alias("n_null_lang"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@query(
    "formats_partitioned_overwrite",
    oracle=(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(round(sum(CAST(value * (CASE WHEN event_type = 'click' "
        "THEN 2 ELSE 1 END) AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
)
def formats_partitioned_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (B11's idempotent-backfill surface —
    the lake operation behind every partition re-run): events land
    partitioned by event_type; a backfill then rewrites ONLY the
    ``click`` partition (values doubled) in overwrite mode with
    ``partitionOverwriteMode=dynamic``.  Equality with the oracle proves
    both halves: the four untouched partitions survived (static
    overwrite would have deleted them) and the rewritten one replaced
    exactly (append would have duplicated it).

    Scale: dynamic overwrite touches only the partitions present in the
    incoming frame — a day's backfill rewrites a day, never the table;
    the same mechanism is the streaming sink's exactly-once story
    (streaming/events.py:route_events_to_nodes).
    """
    import os as _os
    import tempfile as _tf

    base = "".join(
        c if c.isalnum() else "_" for c in _os.path.basename(sf_dir.rstrip("/"))
    )
    out = _os.path.join(_tf.gettempdir(), f"dch_dyn_overwrite_{base}")
    ev = _t(spark, sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    backfill = ev.where(F.col("event_type") == "click").withColumn(
        "value", F.col("value") * 2
    )
    (
        backfill.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            _money_sum("value").alias("total_value"),
        )
        .orderBy("event_type")
    )


@query(
    "formats_compaction",
    oracle=(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(sum(event_id) AS BIGINT) AS id_sum, "
        "CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) "
        "AS total_value "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
)
def formats_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (B11's operational reality: streaming sinks
    and partitioned backfills fragment a table into thousands of tiny
    files, and file-open overhead then dominates every scan): events are
    deliberately fragmented into 64 splinter files, then compacted by a
    single repartition-write into 4 right-sized files; the rollup runs
    over the COMPACTED copy and must equal the source-of-truth oracle —
    compaction is only correct if it is a pure physical rewrite.

    The file counts are asserted in-query (fragmented == 64, compacted
    == 4): silent under-fragmentation would make the test vacuous.

    Scale: this is the nightly OPTIMIZE job at 100 TB — a partition-at-a-
    time repartition-write keyed to target file size; readers see either
    the old or the new manifest, never a half-compacted mix.
    """
    import glob as _glob
    import os as _os
    import tempfile as _tf

    base = "".join(
        c if c.isalnum() else "_" for c in _os.path.basename(sf_dir.rstrip("/"))
    )
    frag_dir = _os.path.join(_tf.gettempdir(), f"dch_frag_{base}")
    comp_dir = _os.path.join(_tf.gettempdir(), f"dch_compact_{base}")
    ev = _t(spark, sf_dir, "events")
    ev.repartition(64).write.mode("overwrite").parquet(frag_dir)
    n_frag = len(_glob.glob(_os.path.join(frag_dir, "*.parquet")))
    if n_frag != 64:
        raise RuntimeError(f"fragmentation produced {n_frag} files, wanted 64")
    spark.read.parquet(frag_dir).repartition(4).write.mode("overwrite").parquet(
        comp_dir
    )
    n_comp = len(_glob.glob(_os.path.join(comp_dir, "*.parquet")))
    if n_comp != 4:
        raise RuntimeError(f"compaction produced {n_comp} files, wanted 4")
    return (
        spark.read.parquet(comp_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("event_id").cast("bigint").alias("id_sum"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )


_MOR_BUCKET_DUCK = (
    "(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 10)"
)


@query(
    "formats_merge_on_read",
    oracle=(
        "WITH eff AS (SELECT o_orderkey, o_orderstatus, "
        f"CASE WHEN {_MOR_BUCKET_DUCK} = 0 THEN '1-URGENT' "
        "ELSE o_orderpriority END AS o_orderpriority, "
        f"CASE WHEN {_MOR_BUCKET_DUCK} = 0 THEN "
        "CAST(o_totalprice AS DECIMAL(18,4)) + 1 "
        "ELSE CAST(o_totalprice AS DECIMAL(18,4)) END AS price "
        f"FROM orders WHERE {_MOR_BUCKET_DUCK} <> 1) "
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(sum(o_orderkey) AS BIGINT) AS key_sum, "
        "CAST(round(sum(price), 2) AS DOUBLE) AS total_price "
        "FROM eff GROUP BY o_orderstatus, o_orderpriority "
        "ORDER BY o_orderstatus, o_orderpriority"
    ),
)
def formats_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read (the Hudi/Iceberg MoR pattern: writers append
    compact CDC deltas, READERS reconcile — the write-amplification
    trade every 100 TB lake makes for fast upserts): a base snapshot of
    ``orders`` (version 0) and a deterministic CDC delta (version 1:
    md5-bucket-0 keys get an UPDATE that re-prioritizes to 1-URGENT and
    adds 1.00 to the price; bucket-1 keys get a DELETE marker) are
    written as separate parquet; the read path unions them and
    reconciles per key with one window — max-version row wins, DELETE
    markers drop — then rolls up the merged view.  The oracle computes
    the same final state directly from the source table, so the grade
    pins the reconciliation semantics (upsert wins, delete hides,
    untouched rows survive), not just the write plumbing.

    Scale: reconciliation is one shuffle on the primary key — the same
    cost as the compactor that would eventually rewrite base files; the
    delta stays |changes|-sized on disk and on the wire.  Price math in
    exact DECIMAL per the repo's money rule.
    """
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from pyspark.sql import Window

    base_tag = "".join(
        c if c.isalnum() else "_" for c in _os.path.basename(sf_dir.rstrip("/"))
    )
    root = _os.path.join(_tf.gettempdir(), f"dch_mor_{base_tag}")
    base_dir = _os.path.join(root, "base")
    delta_dir = _os.path.join(root, "delta")
    _sh.rmtree(root, ignore_errors=True)

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("bigint") % 10
    )
    tagged = orders.withColumn("_b", bucket)
    (
        tagged.select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "price",
            F.lit(0).alias("version"), F.lit("I").alias("op"),
        )
        .write.mode("overwrite").parquet(base_dir)
    )
    updates = tagged.where(F.col("_b") == 0).select(
        "o_orderkey", "o_orderstatus",
        F.lit("1-URGENT").alias("o_orderpriority"),
        (F.col("price") + F.lit(1).cast("decimal(18,4)")).alias("price"),
        F.lit(1).alias("version"), F.lit("U").alias("op"),
    )
    deletes = tagged.where(F.col("_b") == 1).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "price",
        F.lit(1).alias("version"), F.lit("D").alias("op"),
    )
    updates.unionByName(deletes).write.mode("overwrite").parquet(delta_dir)

    merged = (
        spark.read.parquet(base_dir)
        .unionByName(spark.read.parquet(delta_dir))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
            ),
        )
        .where((F.col("_rn") == 1) & (F.col("op") != "D"))
    )
    return (
        merged.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
            F.round(F.sum("price"), 2).cast("double").alias("total_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )
