"""Round-8 additions: edit-distance similarity join, batch
sessionization, the compression-ratio gate (rows-only; zlib has no SQL
mirror), and VARIANT-native semi-structured extraction — oracle-checked
against DuckDB like every other entry (see registry.py for the
aliasing/rounding/timestamp conventions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load_tables, register


@register(
    "fuzzy_edit_join",
    """
    WITH s AS (
        SELECT doc_id AS id, substr(text, 1, 32) AS s
        FROM documents
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.s, b.s) AS INT) AS dist
    FROM s a JOIN s b
      ON a.id < b.id
     AND abs(length(a.s) - length(b.s)) <= 2
     AND levenshtein(a.s, b.s) <= 2
    """,
    "Edit-distance similarity join (extension; no reference "
    "counterpart): all document-prefix pairs within Levenshtein "
    "distance 2, via PassJoin-style segment blocking — pigeonhole on "
    "tau+1 contiguous segments (~len/(tau+1)-char equality keys, cut "
    "in-row before the explode, shift window <= tau), selective even "
    "on this adversarial tiny-vocabulary corpus where gram-granular "
    "blocking floods (measured: 27K candidates vs 3.6M for the "
    "frequency-ordered q-gram prefix sibling, method='prefix') — then "
    "JVM-side levenshtein(a, b, tau) verification (banded early-exit, "
    "codegen, no UDF anywhere). The oracle is the unblocked quadratic "
    "ground-truth join, so a single false negative from the blocking "
    "is a hash mismatch. Library: operators.fuzzyjoin."
    "edit_distance_join; both generators fuzzed against an independent "
    "DP in tests/test_fuzzyjoin.",
)
def fuzzy_edit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzyjoin import edit_distance_join

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    keys = docs.select(
        "doc_id", F.substring("text", 1, 32).alias("k")
    )
    return edit_distance_join(keys, "doc_id", "k", tau=2, q=3)


@register(
    "events_sessionize",
    """
    WITH g AS (
        SELECT user_id, ts, value,
               CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts) AS gap
        FROM events
    ), s AS (
        SELECT user_id, ts, value,
               sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM g
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
               AS duration_seconds
    FROM s
    GROUP BY user_id, session_idx
    """,
    "Batch sessionization at PER-SESSION granularity (extension; the "
    "batch sibling of streaming.events.session_window_stats, and the "
    "session-level complement of the r1-era sessionize_events entry, "
    "which aggregates to one row per USER): lag + flag + running-sum "
    "over ONE (key, ts) window exchange (both window functions share "
    "the single sort), then the per-session rollup rides the same key "
    "partitioning (plan-pinned single exchange). Session ids are "
    "deterministic under timestamp ties (tied events share a session "
    "by construction). Library: operators.timeseries.sessionize / "
    "session_rollup.",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import session_rollup

    ev = load_tables(spark, sf_dir, "events")["events"]
    out = session_rollup(ev, "ts", ["user_id"], gap_seconds=1800)
    return out.select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("duration_seconds").cast("long").alias("duration_seconds"),
    )


@register(
    "curation_compression_gate",
    None,  # zlib is not re-derivable in DuckDB SQL: rows-only check;
    # the family's values are pytest-pinned (tests/test_compression_gate
    # — ordering properties, UTF-8 byte semantics, determinism, bands)
    "Compression-ratio quality gate (extension): zlib compressed/raw "
    "bytes as integer ppm per document plus a band flag "
    "(too_repetitive / ok / too_incompressible) — the long-range-"
    "repetition detector the fixed-n-gram Gopher rules cannot express "
    "(LZ77's window catches cross-line and template repetition). "
    "Arrow-batched pandas_udf; the per-row loop only dispatches into "
    "zlib's C compressor. One scan, no shuffle. Library: operators."
    "curation.compression_gate.",
)
def curation_compression_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import compression_gate

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    out = compression_gate(docs.select("doc_id", "text"))
    return out.select("doc_id", "compression_ppm", "compression_flag")


@register(
    "events_props_variant",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k,
           CAST(count(*) FILTER (CAST(props->>'$.k' AS BIGINT) % 2 = 0)
                AS BIGINT) AS n_even_k
    FROM events
    WHERE props IS NOT NULL
    GROUP BY event_type
    """,
    "Semi-structured props via Spark 4 VARIANT (extension; the "
    "variant-native sibling of f11_json_props' regexp/get_json_object "
    "path): parse_json ONCE per row into VariantType, then typed "
    "variant_get extraction feeds the aggregate — at 100 TB of logs "
    "the variant binary encoding is parsed once at scan time instead "
    "of per-field regexp passes, and extraction is codegen'd "
    "path-offset access, not string scanning. Oracle: DuckDB JSON "
    "path extraction over the same column.",
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.filter(F.col("props").isNotNull())
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
            F.count(F.when(F.col("k") % 2 == 0, 1)).cast("long").alias(
                "n_even_k"
            ),
        )
    )
