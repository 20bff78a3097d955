"""Multimodal-column operators (SURVEY.md §2.8 L10 + the driver's
multimodal extension surface).

Design for opaque media at 100 TB: image/audio/video travel as
``binary`` columns with typed metadata alongside (never decoded into
the shuffle); decode / feature-extract runs as Arrow-batched
``mapInPandas`` at the *edge* of the plan (after pruning/filtering),
so only surviving rows pay the Python hop.  The container has no
image/audio codecs, so the decode kernel here is a deterministic
byte-level feature extractor with the real plumbing — schema, batch
iteration, partition behavior — and the spot where a real codec
(PIL/ffmpeg) would slot in is marked.

The corpus has no binary fixture, so ``documents.text`` is encoded to
bytes as the stand-in payload; byte-level features are then
oracle-checkable against DuckDB string functions, which keeps the
whole mapInPandas path under the exact-match gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.numeric import dec_avg, sql_dec_avg
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

# --- L10: multimodal join (text ⋈ vectors) -----------------------------------

_L10_ORACLE = f"""
SELECT e.label,
       COUNT(*) AS n_docs,
       {sql_dec_avg('d.n_chars', 'avg_chars')},
       ROUND(CAST(SUM(CAST(e.embedding[1] AS DECIMAL(38,9))) AS DOUBLE)
             / COUNT(*), 6) AS avg_first_component,
       CAST(COUNT(DISTINCT d.lang) AS BIGINT) AS n_langs
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY e.label
"""


@query("l10_multimodal_join", oracle=_L10_ORACLE, tags=("multimodal",))
def l10_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10: join the text table to its embedding table (doc_id =
    vec_id) and profile per label — the canonical "one training row =
    text + vector + metadata" assembly."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_docs"),
            dec_avg("n_chars", "avg_chars"),
            F.round(
                F.sum(
                    F.element_at("embedding", 1).cast("decimal(38,9)")
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_first_component"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# --- binary-column decode pipeline (mapInPandas) --------------------------------

_MM_SCHEMA = (
    "doc_id long, n_bytes int, first_byte int, last_byte int, byte_checksum long"
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode' kernel.

    A real deployment decodes media here (PIL.Image.open /
    torchaudio.load / cv2) and emits features or resized payloads;
    this container has no codecs, so the kernel extracts deterministic
    byte-level features — the Spark-side contract (batch iterator in,
    batch iterator out, columnar) is identical either way.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                    "int32"
                ),
                "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype(
                    "int32"
                ),
                "byte_checksum": payloads.map(lambda b: int(sum(b)) % 1_000_003),
            }
        )


# empty payloads take the kernel's sentinel path explicitly: the kernel
# returns first/last_byte = -1 and checksum 0 for b"", while DuckDB's
# ascii('') is 0 and list_sum([]) is NULL — an unguarded oracle would
# diverge on any corpus containing an empty document
_MM_DECODE_ORACLE = """
SELECT doc_id,
       CAST(strlen(text) AS INTEGER) AS n_bytes,
       CAST(CASE WHEN length(text) = 0 THEN -1
                 ELSE ascii(substring(text, 1, 1)) END AS INTEGER)
         AS first_byte,
       CAST(CASE WHEN length(text) = 0 THEN -1
                 ELSE ascii(substring(text, length(text), 1)) END AS INTEGER)
         AS last_byte,
       CAST(COALESCE(list_sum(list_transform(range(1, length(text) + 1),
                     i -> ascii(substring(text, i, 1)))), 0) AS BIGINT)
         % 1000003 AS byte_checksum
FROM documents
WHERE doc_id % 11 = 0
"""


@query("mm_binary_decode", oracle=_MM_DECODE_ORACLE, tags=("multimodal", "udf"))
def mm_binary_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode pipeline: binary payload column + typed
    metadata → mapInPandas feature extraction.  The payload is
    UTF-8-encoded ASCII text (no binary fixture exists), so every
    extracted byte feature is independently checkable via DuckDB
    string/ascii functions — proving the Arrow batch path end-to-end."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    with_payload = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("declared_len"),
            F.col("lang").alias("media_lang"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )
    return with_payload.mapInPandas(_decode_batches, schema=_MM_SCHEMA)


# --- frame-sampling shape (UDTF-style expansion via built-ins) --------------------

_MM_CHUNK_ORACLE = """
WITH chunks AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(length(text) / 100.0) AS BIGINT))) AS chunk_idx
  FROM documents WHERE doc_id % 29 = 0
)
SELECT c.doc_id, c.chunk_idx,
       CAST(length(substring(d.text, CAST(c.chunk_idx * 100 + 1 AS INTEGER), 100)) AS BIGINT)
         AS chunk_len,
       md5(substring(d.text, CAST(c.chunk_idx * 100 + 1 AS INTEGER), 100))
         AS chunk_md5
FROM chunks c JOIN documents d USING (doc_id)
"""


@query("mm_chunk_expansion", oracle=_MM_CHUNK_ORACLE, tags=("multimodal",))
def mm_chunk_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/segment sampling shape: one media row expands to N chunk
    rows (video→frames, audio→windows, doc→passages) via
    posexplode(sequence) — row-to-rows expansion without a UDTF, so
    it stays in codegen.  Chunk identity is md5-stamped for lineage."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 0)
    n_chunks = F.ceil(F.length("text") / 100.0).cast("long")
    # sequence(0, -1) DESCENDS (default step -1), so an empty payload
    # must short-circuit to zero chunk rows, not [0, -1]
    idx = F.when(n_chunks >= 1, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<long>")
    )
    chunks = docs.select("doc_id", "text", F.explode(idx).alias("chunk_idx"))
    chunk_text = F.substring(
        F.col("text"), (F.col("chunk_idx") * 100 + 1).cast("int"), 100
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.length(chunk_text).cast("long").alias("chunk_len"),
        F.md5(chunk_text).alias("chunk_md5"),
    )


# --- resize/downsample shape (mapInPandas, strided resampling) -------------------

_MM_TARGET = 64  # target sample count (the "thumbnail" size)
_MM_RESIZE_SCHEMA = (
    "doc_id long, orig_len int, stride int, resized_len int,"
    " resample_checksum long"
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'resize' kernel: strided downsampling of the
    payload to ≤ _MM_TARGET samples — the 1-D analogue of an image
    thumbnail / audio decimation.  A real deployment calls the codec's
    resampler here (PIL Image.resize / torchaudio.resample); the
    strided pick keeps the identical batch contract while staying
    exactly replayable in SQL.

    The sample unit is the Unicode CODE POINT, not the byte: the
    oracle's length()/substring()/ascii() are all code-point functions,
    so a byte-striding kernel would diverge on the first multi-byte
    character (é is 1 sample here, 2 bytes) — the sibling
    mm_binary_decode documents the opposite (byte-level) convention
    and its ASCII-fixture assumption explicitly."""
    out_cols = ("doc_id", "orig_len", "stride", "resized_len", "resample_checksum")
    for pdf in batches:
        rows = {c: [] for c in out_cols}
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            chars = bytes(b).decode("utf-8")
            n = len(chars)
            if n == 0:
                s, sampled = 0, ""
            else:
                s = -(-n // _MM_TARGET)  # ceil(n / target)
                sampled = chars[::s]
            rows["doc_id"].append(doc_id)
            rows["orig_len"].append(n)
            rows["stride"].append(s)
            rows["resized_len"].append(len(sampled))
            rows["resample_checksum"].append(
                sum(ord(c) for c in sampled) % 1_000_003
            )
        yield pd.DataFrame(
            {
                "doc_id": pd.array(rows["doc_id"], "int64"),
                "orig_len": pd.array(rows["orig_len"], "int32"),
                "stride": pd.array(rows["stride"], "int32"),
                "resized_len": pd.array(rows["resized_len"], "int32"),
                "resample_checksum": pd.array(rows["resample_checksum"], "int64"),
            }
        )


_MM_RESIZE_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, text, length(text) AS n,
         CAST(CASE WHEN length(text) = 0 THEN 0
              ELSE CAST(ceil(length(text) / {_MM_TARGET}.0) AS INTEGER)
              END AS INTEGER) AS stride
  FROM documents WHERE doc_id % 17 = 0
)
SELECT doc_id,
       CAST(n AS INTEGER) AS orig_len,
       stride,
       CAST(CASE WHEN n = 0 THEN 0
            ELSE CAST(ceil(n / CAST(stride AS DOUBLE)) AS INTEGER)
            END AS INTEGER) AS resized_len,
       CAST(CASE WHEN n = 0 THEN 0
            ELSE COALESCE(list_sum(list_transform(
                   range(1, n + 1, stride),
                   i -> ascii(substring(text, CAST(i AS INTEGER), 1)))), 0)
            END AS BIGINT) % 1000003 AS resample_checksum
FROM sized
"""


@query(
    "mm_resize_downsample",
    oracle=_MM_RESIZE_ORACLE,
    tags=("multimodal", "udf"),
)
def mm_resize_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize pipeline: payload + typed metadata →
    mapInPandas strided downsampling to a ≤64-sample 'thumbnail',
    emitting the resample geometry (stride, resized length) and a
    checksum of the sampled bytes.  This is the third leg of the
    decode / frame-sample / RESIZE media surface: the kernel is where
    a real codec resampler slots in, the Spark-side plumbing (Arrow
    batches, schema, pruned payload projection before the Python hop)
    is the production shape, and the byte-level stand-in keeps the
    whole path under the exact-match oracle gate.

    Scale shape: the payload column is projected only for the %17 rows
    that survive pruning, the Python hop is one Arrow round trip at
    the plan edge, and the emitted features are fixed-width — the
    payload itself never enters a shuffle."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 0)
    with_payload = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("declared_len"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )
    return with_payload.mapInPandas(
        _resize_batches, schema=_MM_RESIZE_SCHEMA
    )


# --- feature-extract shape (mapInPandas → fixed-width feature vector) ----------

_MM_FEAT_BINS = 16
_MM_FEAT_SCHEMA = (
    "doc_id long, n_samples int, hist_sig string, top_bin int,"
    " top_count int, nonzero_bins int"
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'feature-extract' kernel: payload → fixed-width
    feature VECTOR (a 16-bin code-point histogram — the 1-D stand-in
    for an image color histogram / audio spectral bins).  A real
    deployment runs the embedding model or signal transform here
    (CLIP/wav2vec/FFT); the byte-level histogram keeps the identical
    contract — variable-length payload in, fixed-width vector out —
    while staying exactly replayable in SQL.

    The vector itself stays INSIDE the kernel (numpy, vectorized) and
    leaves as a deterministic signature plus low-dimensional scalars:
    no registered query ships an array column to the driver's
    value-hash, and the flattening IS the production shape for
    audit queries over a feature store (the full vector would go to a
    parquet sink, not a result set)."""
    import numpy as np

    out = ("doc_id", "n_samples", "hist_sig", "top_bin", "top_count",
           "nonzero_bins")
    for pdf in batches:
        rows = {c: [] for c in out}
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            codes = np.frombuffer(
                bytes(b).decode("utf-8").encode("utf-32-le"), dtype="<u4"
            )
            hist = np.bincount(codes % _MM_FEAT_BINS, minlength=_MM_FEAT_BINS)
            rows["doc_id"].append(doc_id)
            rows["n_samples"].append(len(codes))
            rows["hist_sig"].append(":".join(str(int(c)) for c in hist))
            rows["top_bin"].append(int(np.argmax(hist)))
            rows["top_count"].append(int(hist.max()))
            rows["nonzero_bins"].append(int((hist > 0).sum()))
        import hashlib as _hl

        yield pd.DataFrame(
            {
                "doc_id": pd.array(rows["doc_id"], "int64"),
                "n_samples": pd.array(rows["n_samples"], "int32"),
                "hist_sig": [
                    _hl.md5(s.encode()).hexdigest() for s in rows["hist_sig"]
                ],
                "top_bin": pd.array(rows["top_bin"], "int32"),
                "top_count": pd.array(rows["top_count"], "int32"),
                "nonzero_bins": pd.array(rows["nonzero_bins"], "int32"),
            }
        )


_MM_FEAT_ORACLE = f"""
WITH coded AS (
  SELECT doc_id, length(text) AS n,
         list_transform(range(1, length(text) + 1),
                        i -> ascii(substring(text, CAST(i AS INTEGER), 1))
                             % {_MM_FEAT_BINS}) AS codes
  FROM documents WHERE doc_id % 13 = 0
),
featured AS (
  SELECT doc_id, n,
         list_transform(range(0, {_MM_FEAT_BINS}),
                        b -> length(list_filter(codes, c -> c = b))) AS hist
  FROM coded
)
SELECT doc_id,
       CAST(n AS INTEGER) AS n_samples,
       md5(array_to_string(hist, ':')) AS hist_sig,
       CAST(list_position(hist, list_max(hist)) - 1 AS INTEGER) AS top_bin,
       CAST(list_max(hist) AS INTEGER) AS top_count,
       CAST(length(list_filter(hist, x -> x > 0)) AS INTEGER)
         AS nonzero_bins
FROM featured
"""


@query(
    "mm_feature_extract",
    oracle=_MM_FEAT_ORACLE,
    tags=("multimodal", "udf"),
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction: payload + typed metadata →
    mapInPandas fixed-width feature vector (16-bin code-point
    histogram), flattened to a signature + audit scalars.  The fourth
    leg of the decode / frame-sample / resize / FEATURE-EXTRACT media
    surface named by the pipeline brief: the kernel is where the
    embedding model slots in, and the numpy path (frombuffer +
    bincount, no per-char Python loop) is the vectorized shape a real
    extractor needs.

    Scale shape: payload projected only for the %13 rows after
    pruning, one Arrow hop at the plan edge, fixed-width output —
    identical to its siblings; the feature vector never enters a
    shuffle (signature + scalars only)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    with_payload = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("declared_len"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )
    return with_payload.mapInPandas(_feature_batches, schema=_MM_FEAT_SCHEMA)
