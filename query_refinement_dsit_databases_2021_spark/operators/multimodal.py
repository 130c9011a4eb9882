"""Multimodal (image / audio / video) column plumbing.

Media are opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` — the pattern a real pipeline uses for
decode / feature-extract / resize / frame-sample at 100 TB:

- the binary payload NEVER hits the driver (no collect); each executor
  decodes its own Arrow batches;
- the UDF is a generator over ``pandas.DataFrame`` batches, so peak
  memory is one batch (``spark.sql.execution.arrow.maxRecordsPerBatch``),
  not one partition;
- output is a fresh explicit schema — decoded features, not blobs —
  so downstream stages shuffle small typed rows, not media bytes.

The image/audio libraries are NOT in this container, so the real codec
path is a clearly-marked stub (:func:`decode_media_real` raises
``NotImplementedError``); tests and workloads use the deterministic
FAKE container format below, which makes the whole pipeline
end-to-end checkable: features extracted from the *bytes* in pandas
are cross-validated by a DuckDB oracle recomputing them from the
*source text* the bytes were synthesized from.

FAKE container format (all ASCII, variable length)::

    b"FAKE|<width>|<height>|<payload-utf8>"

with width = doc_id % 240 + 16, height = (doc_id * 7) % 240 + 16 —
synthesized JVM-side in :func:`synthesize_media`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from query_refinement_dsit_databases_2021_spark.operators.textops import HASH_P

MEDIA_TYPES = ("image", "audio", "video")

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "thumb_w int, thumb_h int, checksum long"
)


def decode_media_real(content: bytes, media_type: str):
    """Real codec path — intentionally unimplemented in this
    container (no PIL/ffmpeg/soundfile). A deployment with codec
    libraries replaces this one function; all Spark-side plumbing
    (schema, batching, partitioning) is identical."""
    raise NotImplementedError(
        "media codec libraries are not available in this environment; "
        "use the deterministic FAKE decoder (decode_media_fake)"
    )


def decode_media_fake(content: bytes) -> tuple[int, int, bytes]:
    """Parse the FAKE container: returns (width, height, payload)."""
    if not content.startswith(b"FAKE|"):
        raise ValueError("not a FAKE container")
    _, w, h, payload = content.split(b"|", 3)
    return int(w), int(h), payload


def synthesize_media(docs: DataFrame) -> DataFrame:
    """(doc_id, media_type, content): deterministic binary media
    derived from the documents table — entirely JVM-side column
    algebra (no Python), so synthesis scales with the scan."""
    w = (F.col("doc_id") % 240 + 16).cast("int")
    h = ((F.col("doc_id") * 7) % 240 + 16).cast("int")
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    content = F.encode(
        F.concat_ws("|", F.lit("FAKE"), w.cast("string"), h.cast("string"), F.col("text")),
        "utf-8",
    )
    return docs.select(
        "doc_id", media_type.alias("media_type"), content.alias("content")
    )


def payload_dedup(media: DataFrame) -> DataFrame:
    """Content-addressable dedup of media PAYLOADS per modality: the
    container header (dimensions, format metadata) is stripped before
    hashing, so re-encoded copies of the same content — different
    width/height metadata, same payload — dedup together, which
    byte-level dedup of the full container cannot do.

    Entirely JVM-side: regexp header strip + sha2 + one map-combinable
    groupBy on (media_type, 32-byte digest) — the
    :func:`dedup.exact_dedup` shuffle shape lifted onto the binary
    column. Real codecs swap the header-strip expression for a decode
    UDF; the dataflow is unchanged.

    Returns ``(media_type, keep_id, n_copies)``.
    """
    payload = F.regexp_replace(
        F.decode(F.col("content"), "utf-8"),
        r"^FAKE\|[0-9]+\|[0-9]+\|",
        "",
    )
    return (
        media.select(
            "doc_id",
            "media_type",
            F.sha2(payload, 256).alias("_k"),
        )
        .groupBy("media_type", "_k")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("media_type", "keep_id", "n_copies")
    )


ORACLE_MEDIA_PAYLOAD_DEDUP = """
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY doc_id % 3, text
ORDER BY media_type, keep_id"""


def extract_features(
    media: DataFrame, use_real_codecs: bool = False, decoder=None
) -> DataFrame:
    """Decode + feature-extract over the binary column via
    ``mapInPandas``: per media row emits byte count, decoded
    dimensions, a 4x-downsampled thumbnail size (the "resize" step),
    and a payload checksum (stand-in for content features).

    ``use_real_codecs=True`` routes decoding through the real-codec
    seam: ``decoder`` if supplied (the deployment injection point — a
    ``(content: bytes, media_type: str) -> (width, height, payload)``
    callable; also how the contract test drives the real path without
    codec libs), else :func:`decode_media_real`, which raises in this
    container. The real path's decoded tuple feeds the SAME feature
    columns as the fake path — swapping in PIL/ffmpeg is one function,
    not a new pipeline. ``decoder`` travels inside the closure, so a
    locally-defined callable is pickled by value to the Python
    workers."""
    if decoder is None and use_real_codecs:
        decoder = decode_media_real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, mt, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                b = bytes(content)
                if use_real_codecs:
                    w, h, payload = decoder(b, mt)
                else:
                    w, h, payload = decode_media_fake(b)
                checksum = sum(payload) % HASH_P
                rows.append(
                    (int(doc_id), mt, len(b), w, h, w // 4, h // 4, checksum)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "width",
                    "height",
                    "thumb_w",
                    "thumb_h",
                    "checksum",
                ],
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits one row per
    sampled "frame" index (height stands in for frame count in the
    FAKE format). Output is (doc_id, frame_idx, frame_checksum) —
    the shape a real ffmpeg-backed sampler would produce."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, mt, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                if mt != "video":
                    continue
                w, h, payload = decode_media_fake(bytes(content))
                for idx in range(0, h, every):
                    rows.append(
                        (int(doc_id), idx, (sum(payload) + idx) % HASH_P)
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_checksum"]
            )

    return media.mapInPandas(
        batches, schema="doc_id long, frame_idx int, frame_checksum long"
    )


AHASH_BITS = 60  # < 63 so the bit-sum stays comfortably in int64


def perceptual_ahash(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint over the decoded
    payload — the embedding-free near-dup detector for media columns
    (real deployments aHash the decoded 8×8 grayscale image; the FAKE
    format aHashes the payload's first ``AHASH_BITS`` bytes, identical
    dataflow). Bit *i* of the fingerprint is set when byte *i* exceeds
    the mean of the sampled window, so re-encodes that preserve
    content brightness structure collide while distinct content
    scatters — coarser than byte-exact :func:`payload_dedup`, which
    is the point.

    Entirely JVM-side column algebra (header strip + one
    ``transform``/``aggregate`` pass per row — no UDF, no shuffle
    until the dup-group aggregation). Returns collision groups:
    ``(media_type, fingerprint, keep_id, n_copies)`` with
    ``n_copies >= 2``, the shape :func:`payload_dedup` reports.
    """
    payload = F.regexp_replace(
        F.decode(F.col("content"), "utf-8"),
        r"^FAKE\|[0-9]+\|[0-9]+\|",
        "",
    )
    b = AHASH_BITS
    # staged projections (the shingles() materialize-then-use rule):
    # payload -> byte-code window -> window mean -> bit fold. Each
    # stage binds the previous one to a column, so the mean is
    # computed ONCE per row instead of re-folded per bit position
    # (the collapsed single expression was O(bits²) per row)
    codes = F.expr(
        f"""
        transform(sequence(1, {b}), i ->
          CASE WHEN i <= length(p) THEN ascii(substring(p, i, 1))
               ELSE 0 END)
        """
    )
    mu = F.expr(f"aggregate(cs, 0L, (a, x) -> a + x) DIV {b}")
    fp = F.expr(
        f"""
        aggregate(
          transform(sequence(1, {b}), i ->
            CASE WHEN element_at(cs, i) > mu
                 THEN shiftleft(1L, i - 1) ELSE 0L END),
          0L, (a, x) -> a + x)
        """
    )
    hashed = (
        media.select("doc_id", "media_type", payload.alias("p"))
        .select("doc_id", "media_type", codes.alias("cs"))
        .select("doc_id", "media_type", "cs", mu.alias("mu"))
        .select("doc_id", "media_type", fp.alias("fingerprint"))
    )
    return (
        hashed.groupBy("media_type", "fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") >= 2)
        .select("media_type", "fingerprint", "keep_id", "n_copies")
    )


ORACLE_MEDIA_AHASH = f"""
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         text AS p
  FROM documents),
codes AS (
  SELECT doc_id, media_type, u.i,
         CASE WHEN u.i <= length(p) THEN ascii(substr(p, u.i, 1))
              ELSE 0 END AS code
  FROM m, unnest(range(1, {AHASH_BITS + 1})) u(i)),
mean AS (
  SELECT doc_id, media_type, sum(code) // {AHASH_BITS} AS mu
  FROM codes GROUP BY 1, 2),
fp AS (
  SELECT c.doc_id, c.media_type,
         CAST(sum(CASE WHEN c.code > mn.mu
                       THEN (1::BIGINT << (c.i - 1)) ELSE 0 END)
              AS BIGINT) AS fingerprint
  FROM codes c JOIN mean mn USING (doc_id, media_type)
  GROUP BY 1, 2)
SELECT media_type, fingerprint,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM fp GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY media_type, keep_id"""


def _wl_media_ahash(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return perceptual_ahash(
        synthesize_media(spark.table("documents"))
    ).orderBy("media_type", "keep_id")


# ---------------------------------------------------------------------------
# Workload: features extracted from BYTES in pandas, oracle recomputes
# them from the source TEXT in SQL
# ---------------------------------------------------------------------------

ORACLE_MEDIA_FEATURES = f"""
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         (doc_id % 240 + 16)::INT AS width,
         ((doc_id * 7) % 240 + 16)::INT AS height,
         text
  FROM documents)
SELECT doc_id, media_type,
       (length('FAKE|' || width || '|' || height || '|') + length(text))::BIGINT
           AS n_bytes,
       width, height,
       (width // 4)::INT AS thumb_w, (height // 4)::INT AS thumb_h,
       list_reduce(list_prepend(0::BIGINT,
           list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
           (acc, c) -> acc + c) % {HASH_P} AS checksum
FROM m"""


ORACLE_MEDIA_FRAMES = f"""
WITH m AS (
  SELECT doc_id,
         ((doc_id * 7) % 240 + 16)::INT AS height,
         list_reduce(list_prepend(0::BIGINT,
             list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
             (acc, c) -> acc + c) % {HASH_P} AS cs
  FROM documents WHERE doc_id % 3 = 2)
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       (cs + i) % {HASH_P} AS frame_checksum
FROM (SELECT doc_id, cs, unnest(range(0, height, 10)) AS i FROM m)"""


def _wl_media_features(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return extract_features(synthesize_media(spark.table("documents")))


def _wl_media_dedup(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return payload_dedup(synthesize_media(spark.table("documents")))


def _wl_media_frames(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return frame_sample(synthesize_media(spark.table("documents")))


SHARD_TARGET_BYTES = 32_768


def shard_pack(media: DataFrame, target_bytes: int = SHARD_TARGET_BYTES) -> DataFrame:
    """WebDataset-style shard packing plan: assign media items to
    size-bounded training shards per modality (largest-first next-fit
    over the byte sizes — the compaction-planner rule lifted onto the
    binary column) and emit the per-shard manifest a dataloader
    consumes: ``(media_type, shard, n_items, total_bytes, min_doc,
    max_doc, xor_sig)``.

    The xor signature over ``(doc_id·1000003 + bytes) % HASH_P`` is
    order-free, so a rewritten shard can be re-verified without
    re-reading payloads. The cumsum window partitions by modality; at
    100 TB sub-partition the window key (modality, date) so no single
    ordering exceeds a task — shard ids then nest per sub-partition
    (SCALE.md). Only sizes flow through the shuffle, never payload
    bytes.
    """
    from pyspark.sql import Window

    sized = media.select(
        "media_type",
        "doc_id",
        F.octet_length("content").cast("long").alias("bytes"),
    )
    w = (
        Window.partitionBy("media_type")
        .orderBy(F.desc("bytes"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = sized.select(
        "media_type",
        "doc_id",
        "bytes",
        F.floor(
            F.coalesce(F.sum("bytes").over(w), F.lit(0)) / F.lit(int(target_bytes))
        ).alias("shard"),
    )
    sig = (F.col("doc_id") * 1000003 + F.col("bytes")) % F.lit(HASH_P)
    return (
        planned.groupBy("media_type", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("bytes").alias("total_bytes"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.expr(f"bit_xor(CAST((doc_id * 1000003 + bytes) % {HASH_P} AS BIGINT))")
            .alias("xor_sig"),
        )
        .orderBy("media_type", "shard")
    )


def _wl_shard_pack(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return shard_pack(synthesize_media(spark.table("documents")))


def shard_balance(manifest: DataFrame) -> DataFrame:
    """Shard-balance audit over a :func:`shard_pack` manifest: per
    modality, the shard count, largest and (lower-)median shard
    bytes, and ``balance_ppm = (1e6·median) DIV max`` — the skew
    number a dataloader capacity plan reads (a low ratio means
    stragglers: one fat shard gates the epoch). The median is the
    tie-broken ``row_number == (n+1) DIV 2`` element ordered by
    (bytes, shard) — the repo's exact-percentile convention, so both
    engines pick the identical shard.

    Manifest-sized input ⇒ everything here is metadata-scale.
    Returns ``(media_type, n_shards, max_bytes, median_bytes,
    balance_ppm)``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("media_type").orderBy("total_bytes", "shard")
    cnt = Window.partitionBy("media_type")
    ranked = manifest.select(
        "media_type",
        "total_bytes",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(cnt).alias("_n"),
        F.max("total_bytes").over(cnt).alias("_mx"),
    )
    med = ranked.where(
        F.col("_rn") == F.expr("(_n + 1) DIV 2")
    ).select(
        "media_type",
        F.col("_n").cast("long").alias("n_shards"),
        F.col("_mx").cast("long").alias("max_bytes"),
        F.col("total_bytes").cast("long").alias("median_bytes"),
    )
    return med.select(
        "media_type",
        "n_shards",
        "max_bytes",
        "median_bytes",
        F.expr("(1000000 * median_bytes) DIV max_bytes")
        .cast("long")
        .alias("balance_ppm"),
    ).orderBy("media_type")


def _wl_shard_balance(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return shard_balance(shard_pack(synthesize_media(spark.table("documents"))))


ORACLE_SHARD_PACK = f"""
WITH sized AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         doc_id,
         CAST(strlen('FAKE|' || (doc_id % 240 + 16) || '|'
                     || ((doc_id * 7) % 240 + 16) || '|' || text)
              AS BIGINT) AS bytes
  FROM documents),
planned AS (
  SELECT media_type, doc_id, bytes,
         CAST(floor(coalesce(sum(bytes) OVER (
                 PARTITION BY media_type
                 ORDER BY bytes DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {SHARD_TARGET_BYTES}) AS BIGINT) AS shard
  FROM sized)
SELECT media_type, shard, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc,
       CAST(bit_xor((doc_id * 1000003 + bytes) % {HASH_P}) AS BIGINT) AS xor_sig
FROM planned GROUP BY media_type, shard
ORDER BY media_type, shard"""


ORACLE_SHARD_BALANCE = f"""
WITH manifest AS ({{pack}}),
ranked AS (
  SELECT media_type, total_bytes,
         row_number() OVER (PARTITION BY media_type
             ORDER BY total_bytes, shard) AS rn,
         count(*) OVER (PARTITION BY media_type) AS n,
         max(total_bytes) OVER (PARTITION BY media_type) AS mx
  FROM manifest)
SELECT media_type, CAST(n AS BIGINT) AS n_shards,
       CAST(mx AS BIGINT) AS max_bytes,
       CAST(total_bytes AS BIGINT) AS median_bytes,
       CAST((1000000 * total_bytes) // mx AS BIGINT) AS balance_ppm
FROM ranked
WHERE rn = (n + 1) // 2
ORDER BY media_type""".format(pack=ORACLE_SHARD_PACK)


def multimodal_workloads():
    from query_refinement_dsit_databases_2021_spark.workloads import Workload

    return [
        Workload("pipe_media_shard_pack", _wl_shard_pack, ORACLE_SHARD_PACK, False),
        Workload(
            "pipe_media_shard_balance",
            _wl_shard_balance,
            ORACLE_SHARD_BALANCE,
            False,
        ),
        Workload("pipe_media_features", _wl_media_features, ORACLE_MEDIA_FEATURES, False),
        Workload("pipe_media_frames", _wl_media_frames, ORACLE_MEDIA_FRAMES, False),
        Workload(
            "pipe_media_payload_dedup",
            _wl_media_dedup,
            ORACLE_MEDIA_PAYLOAD_DEDUP,
            False,
        ),
        Workload(
            "pipe_media_ahash",
            _wl_media_ahash,
            ORACLE_MEDIA_AHASH,
            False,
        ),
    ]
