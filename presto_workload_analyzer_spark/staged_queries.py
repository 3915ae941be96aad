"""STAGED driver queries — implemented, oracle-paired, locally verified,
NOT registered.

The round-5 verdict froze the registry at 222 until the driver's 50-slot
window clears the never-verified backlog (expected during round 8).
These entries are the next registrations, prepared so the unfreeze is a
one-line move into driver_queries: each is a (spark_fn, oracle_sql)
pair in exactly the registry's contract (column names aliased
identically on both sides, integer aggregates cast, floats rounded to 6,
no HUGEINT/DECIMAL bindings), and tests/test_staged_queries.py runs the
same spark-vs-DuckDB comparison the local gate applies to registered
queries.

Registration checklist (so the r9 unfreeze is mechanical): move each
(name, fn, sql) into driver_queries._register, gate-first in the window;
add "xs4_mjpeg_frame_pipeline" to test_plan_lint._ALLOWED_PANDAS (AVI
synth + JPEG decode are declared Arrow mapInPandas surfaces — the same
class as x133-x139); xs1/xs2/xs3/xs5 are pure Column/join plans and need
no lint exemption.

Staged surface (both published LLM-data-pipeline methods, library code
in extensions/, landed round 7):
  * xs1_semantic_dedup  — SemDeDup survivors (cluster-scoped exact
    cosine -> connected components -> min-id exemplar), clusters = the
    embeddings table's label column.
  * xs2_dsir_weights    — DSIR hashed-unigram log importance weights of
    a deterministic target slice (doc_id % 10 = 0) over the full
    documents corpus; md5 feature hashing for engine parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SEMDEDUP_THRESHOLD = 0.9


def xs1_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from presto_workload_analyzer_spark.extensions import dedup
    from presto_workload_analyzer_spark.sources import read_table

    emb = read_table(spark, f"{sf}/embeddings.parquet")
    kept = dedup.semantic_dedup(
        emb, "vec_id", "embedding", "label", threshold=SEMDEDUP_THRESHOLD
    )
    return kept.select("vec_id")


def xs1_sql() -> str:
    t = SEMDEDUP_THRESHOLD
    return (
        "WITH RECURSIVE e AS (SELECT vec_id, label,"
        "  CAST(embedding AS DOUBLE[]) AS v FROM embeddings),"
        " prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b"
        "  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id"
        "  WHERE list_dot_product(a.v, b.v)"
        "   / (sqrt(list_dot_product(a.v, a.v))"
        f"   * sqrt(list_dot_product(b.v, b.v))) >= {t!r}),"
        " edges AS (SELECT id_a AS src, id_b AS dst FROM prs"
        "  UNION SELECT id_b, id_a FROM prs),"
        " walk(id, lab) AS ("
        "  SELECT src, src FROM edges"
        "  UNION"
        "  SELECT e2.src, w.lab FROM walk w JOIN edges e2 ON e2.dst = w.id),"
        " cc AS (SELECT id, min(lab) AS cluster_id FROM walk GROUP BY id)"
        " SELECT vec_id FROM embeddings"
        " WHERE vec_id NOT IN (SELECT id FROM cc WHERE id <> cluster_id)"
    )


def xs2_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    from presto_workload_analyzer_spark.extensions import sampling
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    target = docs.filter(F.col("doc_id") % 10 == 0)
    return sampling.dsir_log_weights(docs, target, "doc_id", "text", mode="md5")


def xs2_sql() -> str:
    d, a = 4096, 1.0
    tok = (
        r"SELECT doc_id, t.w AS w FROM {src},"
        r" UNNEST(string_split_regex(trim(text), '\s+')) AS t(w)"
        r" WHERE t.w <> ''"
    )
    return (
        "WITH stok AS (" + tok.format(src="documents") + "),"
        " ttok AS (" + tok.format(
            src="(SELECT * FROM documents WHERE doc_id % 10 = 0)") + "),"
        " sfeat AS (SELECT doc_id,"
        "   CAST(('0x' || substr(md5(w), 1, 3)) AS BIGINT) AS feat,"
        "   CAST(count(*) AS BIGINT) AS c FROM stok GROUP BY 1, 2),"
        " tfeat AS (SELECT CAST(('0x' || substr(md5(w), 1, 3)) AS BIGINT) AS feat,"
        "   CAST(count(*) AS BIGINT) AS c FROM ttok GROUP BY 1),"
        " stot AS (SELECT feat, CAST(sum(c) AS BIGINT) AS cs FROM sfeat GROUP BY 1),"
        " tots AS (SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM sfeat) AS S,"
        "   (SELECT CAST(sum(c) AS DOUBLE) FROM tfeat) AS T),"
        " ratio AS (SELECT coalesce(stot.feat, tfeat.feat) AS feat,"
        f"   (ln(coalesce(tfeat.c, 0) + {a!r}) - ln(tots.T + {a!r} * {d}))"
        f" - (ln(coalesce(stot.cs, 0) + {a!r}) - ln(tots.S + {a!r} * {d}))"
        "    AS log_ratio"
        "  FROM stot FULL OUTER JOIN tfeat ON stot.feat = tfeat.feat"
        "  CROSS JOIN tots)"
        " SELECT sfeat.doc_id,"
        "  round(sum(sfeat.c * ratio.log_ratio), 6) AS log_w,"
        "  CAST(sum(sfeat.c) AS BIGINT) AS n_tokens"
        " FROM sfeat JOIN ratio ON sfeat.feat = ratio.feat"
        " GROUP BY 1"
    )


STAGED: dict[str, tuple] = {
    "xs1_semantic_dedup": (xs1_semantic_dedup, xs1_sql()),
    "xs2_dsir_weights": (xs2_dsir_weights, xs2_sql()),
}


DSIR_MIX_K = 25


def xs3_dsir_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source top-K most target-like documents by DSIR weight — the
    mix-planning shape: a curated target defines the direction, and each
    source contributes its K best-aligned docs (rank window partitioned
    by source: group-grain, bounded partitions, never a global sort).
    Ties rank on the ROUNDED weight with doc_id as tiebreak so the
    ordering is engine-portable."""
    from pyspark.sql import Window

    from presto_workload_analyzer_spark.extensions import sampling
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    target = docs.filter(F.col("doc_id") % 10 == 0)
    w = sampling.dsir_log_weights(docs, target, "doc_id", "text", mode="md5")
    ranked = (
        docs.select("doc_id", "source")
        .join(w, "doc_id")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("log_w").desc(), F.col("doc_id")
                )
            ),
        )
    )
    return ranked.filter(F.col("__rn") <= DSIR_MIX_K).select(
        "doc_id", "source", "log_w"
    )


def xs3_sql() -> str:
    return (
        "WITH w AS (" + xs2_sql() + ")"
        " SELECT doc_id, source, log_w FROM ("
        "  SELECT d.doc_id, d.source, w.log_w,"
        "   row_number() OVER (PARTITION BY d.source"
        "    ORDER BY w.log_w DESC, d.doc_id) AS rn"
        "  FROM documents d JOIN w ON d.doc_id = w.doc_id)"
        f" WHERE rn <= {DSIR_MIX_K}"
    )


STAGED["xs3_dsir_mix"] = (xs3_dsir_mix, xs3_sql())


def xs4_mjpeg_frame_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """MJPEG-in-AVI REAL frame-pixel-decode driver gate (round-7 verdict
    item 4 — the only real media kernel without an x133-style pipeline
    query). Per doc: 2 + doc_id%3 flat grayscale frames at per-doc dims
    (8*(1+doc_id%3) x 8*(1+doc_id%2)), frame i's intensity
    (doc_id*37 + i*59) % 256, encoded by the REAL baseline-JPEG encoder
    and wrapped in the structurally real RIFF-AVI (encode_avi_mjpeg);
    mjpeg_frame_stats walks the container with stride 2 and decodes the
    sampled frames through the real JPEG decoder. Flat fields quantize
    EXACTLY through this codec pair (DC-only blocks; round-trip verified
    for all 256 values), so width/height/channels/mean all have closed
    forms and any RIFF-walk, stride, DCT/quant or unfilter bug is a hash
    mismatch. Payloads are built and decoded executor-side (Arrow
    mapInPandas both sides); only frame-stat rows move."""
    from pyspark.sql import types as T

    from presto_workload_analyzer_spark.extensions import multimodal as X_mm
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet").select("doc_id")

    def synth(batches):
        import pandas as pd

        from presto_workload_analyzer_spark.extensions.jpegcodec import encode_jpeg
        from presto_workload_analyzer_spark.extensions.multimodal import (
            encode_avi_mjpeg,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 * (1 + doc_id % 3), 8 * (1 + doc_id % 2)
                frames = [
                    encode_jpeg(w, h, 1, bytes([(doc_id * 37 + i * 59) % 256]) * (w * h))
                    for i in range(2 + doc_id % 3)
                ]
                rows.append((doc_id, encode_avi_mjpeg(frames, fps=10, width=w, height=h)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    media = docs.mapInPandas(
        synth,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )
    out = X_mm.mjpeg_frame_stats(media, every_n_frames=2)
    return out.select(
        "doc_id",
        "frame_idx",
        "width",
        "height",
        "channels",
        F.round("mean_intensity", 6).alias("mean_intensity"),
    )


def xs4_sql() -> str:
    return (
        "SELECT doc_id, CAST(t.idx AS INT) AS frame_idx,"
        " CAST(8 * (1 + doc_id % 3) AS INT) AS width,"
        " CAST(8 * (1 + doc_id % 2) AS INT) AS height,"
        " CAST(1 AS INT) AS channels,"
        " round(CAST((doc_id * 37 + t.idx * 59) % 256 AS DOUBLE) / 255.0, 6)"
        "  AS mean_intensity"
        " FROM documents, UNNEST([0, 2]) AS t(idx)"
        " WHERE t.idx < 2 + doc_id % 3"
    )


STAGED["xs4_mjpeg_frame_pipeline"] = (xs4_mjpeg_frame_pipeline, xs4_sql())


XS5_MAX_BUCKET = 2


def xs5_guarded_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Guard-ON LSH candidate pairs (round-7 verdict item 8): the
    mega-bucket star guard (dedup.lsh_candidate_pairs max_bucket_size) is
    default-off for x02 oracle parity, so no driver row ever exercises
    guard-on semantics — yet the prune is deterministic, so an oracle can
    replay it exactly: buckets with more than `max_bucket_size` members
    emit a STAR (bucket-min id -> every other member, n-1 edges) instead
    of the all-pairs enumeration. The cap here (2) is sized to the tiny
    test corpora so oversized buckets actually exist at sf0.001/sf0.01
    (max observed bucket = 4/3) and the star path is gate-covered; at
    100 TB the same code runs with cap ~10_000. The md5/k=3/h16/b4
    parameters match x02 exactly, so guard-on-vs-off is the ONLY
    difference between this oracle and x02's."""
    from presto_workload_analyzer_spark.extensions import dedup
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, bands=4, mode="md5",
        max_bucket_size=XS5_MAX_BUCKET,
    )


def xs5_sql() -> str:
    # the x02 minhash->band pipeline fragments, then the guard replayed in
    # SQL: per-bucket counts split small buckets (all-pairs) from oversized
    # ones (star from the bucket-min id)
    from presto_workload_analyzer_spark.driver_queries import (
        _SHINGLE_SQL,
        _X02_BANDS,
        _X02_SIGS,
    )

    cap = XS5_MAX_BUCKET
    return (
        f"WITH {_SHINGLE_SQL}, sig AS (SELECT id, {_X02_SIGS} FROM sh GROUP BY id),"
        f" bands AS ({_X02_BANDS}),"
        " bk AS (SELECT band, band_hash, count(*) AS n, min(id) AS min_id"
        "  FROM bands GROUP BY 1, 2)"
        " SELECT DISTINCT id_a, id_b FROM ("
        "  SELECT a.id AS id_a, b.id AS id_b"
        "  FROM bands a JOIN bands b USING (band, band_hash)"
        f"  JOIN bk USING (band, band_hash) WHERE bk.n <= {cap} AND a.id < b.id"
        "  UNION ALL"
        "  SELECT bk.min_id AS id_a, b.id AS id_b"
        "  FROM bands b JOIN bk USING (band, band_hash)"
        f"  WHERE bk.n > {cap} AND b.id <> bk.min_id)"
    )


STAGED["xs5_guarded_lsh_pairs"] = (xs5_guarded_lsh_pairs, xs5_sql())
