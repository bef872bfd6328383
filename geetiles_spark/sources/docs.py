"""Interleaved text+media documents table (the engine's primary input shape).

Per ``BASELINE.json`` ``input_hint`` the engine fronts an Iceberg table
``docs(doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)``.
Media spans point at chip payloads via ``media_ref = '{dataset}/{tile_id}'``
— the Spark-native replacement for the reference's filesystem layout
``{tiles_dir}/{dataset}/{identifier}.tif`` (``partitions.py:439-445``).

Invariant enforced engine-wide: **span-sequence equality** — every stage that
passes documents through must preserve (kind, text, media_ref, order) per
document; extraction reads spans positionally and never rewrites them.

This module provides the deterministic generator (FIXTURES.md §1: one doc per
(tile, dataset) pair + 10% pure-text docs, 2-6 alternating spans) and the
span-extraction / reconstruction operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
    ]
)

_WORDS = (
    "tile grid aoi chip raster label class cover forest water urban crop "
    "band pixel utm zone lat lon median composite cloud mask split train"
).split()


def _doc_seed(key: str) -> np.random.Generator:
    return np.random.default_rng(
        int(hashlib.sha256(key.encode()).hexdigest()[:16], 16)
    )


def _make_spans(doc_key: str, media_ref: str | None) -> list[dict]:
    rng = _doc_seed(doc_key)
    n_spans = int(rng.integers(2, 7))
    spans = []
    for off in range(n_spans):
        is_media = media_ref is not None and off % 2 == 1
        if is_media:
            spans.append(
                {"kind": "media", "text": "", "media_ref": media_ref, "offset": off}
            )
        else:
            words = rng.choice(_WORDS, size=int(rng.integers(3, 12)))
            spans.append(
                {
                    "kind": "text",
                    "text": " ".join(words.tolist()),
                    "media_ref": "",
                    "offset": off,
                }
            )
    return spans


def generate_docs(tiles: DataFrame, datasets: list[str]) -> DataFrame:
    """One document per (tile, dataset) + ~10% pure-text docs, deterministic."""
    ds_df = tiles.sparkSession.createDataFrame(
        [(d,) for d in datasets], ["dataset"]
    )
    pairs = tiles.select("tile_id", "row_idx").crossJoin(F.broadcast(ds_df))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tile_id, row_idx, dataset in zip(
                pdf["tile_id"], pdf["row_idx"], pdf["dataset"]
            ):
                media_ref = f"{dataset}/{tile_id}"
                doc_id = f"doc-{dataset}-{tile_id}"
                rows.append(
                    {"doc_id": doc_id, "spans": _make_spans(doc_id, media_ref)}
                )
                # ~10% extra pure-text docs, keyed deterministically
                if int(row_idx) % 10 == 0 and dataset == datasets[0]:
                    tid = f"doc-text-{tile_id}"
                    rows.append({"doc_id": tid, "spans": _make_spans(tid, None)})
            yield pd.DataFrame(rows)

    return pairs.mapInPandas(gen, DOC_SCHEMA)


def make_spans_pattern(doc_id: str, media_ref: str | None) -> list[dict]:
    """Closed-form span generator (SQL-expressible twin of
    :func:`_make_spans`): every span derives from the sha256-prefix seed by
    integer arithmetic, so the DuckDB oracle re-derives the full
    (kind, text, media_ref, offset) sequence — the driver-checked form of
    the span-sequence-equality invariant."""
    seed = int(hashlib.sha256(doc_id.encode()).hexdigest()[:12], 16)
    n_spans = 2 + seed % 5
    spans = []
    for off in range(n_spans):
        if media_ref is not None and off % 2 == 1:
            spans.append(
                {"kind": "media", "text": "", "media_ref": media_ref, "offset": off}
            )
        else:
            n_words = 3 + (seed + 11 * off) % 9
            words = [_WORDS[(seed + 7 * off + 13 * k) % 24] for k in range(n_words)]
            spans.append(
                {
                    "kind": "text",
                    "text": " ".join(words),
                    "media_ref": "",
                    "offset": off,
                }
            )
    return spans


def generate_docs_pattern(tiles: DataFrame, dataset: str) -> DataFrame:
    """One pattern-span document per tile (doc_id = 'doc-{dataset}-{tile_id}',
    media spans pointing at the tile's chip)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tile_id in pdf["tile_id"]:
                doc_id = f"doc-{dataset}-{tile_id}"
                rows.append(
                    {
                        "doc_id": doc_id,
                        "spans": make_spans_pattern(doc_id, f"{dataset}/{tile_id}"),
                    }
                )
            yield pd.DataFrame(rows)

    return tiles.select("tile_id").mapInPandas(gen, DOC_SCHEMA)


def extract_media_refs(docs: DataFrame) -> DataFrame:
    """Positional span scan: (doc_id, span_pos, media_ref) for media spans.

    Pure DataFrame ops (posexplode + filter) — the read side never mutates
    spans, so span-sequence equality holds trivially; verified by
    :func:`span_sequence_fingerprint` fixtures.
    """
    return (
        docs.select("doc_id", F.posexplode("spans").alias("span_pos", "span"))
        .filter(F.col("span.kind") == "media")
        .select(
            "doc_id",
            "span_pos",
            F.col("span.media_ref").alias("media_ref"),
            F.split_part(F.col("span.media_ref"), F.lit("/"), F.lit(1)).alias("dataset"),
            F.split_part(F.col("span.media_ref"), F.lit("/"), F.lit(2)).alias("tile_id"),
        )
    )


def span_sequence_fingerprint(docs: DataFrame) -> DataFrame:
    """Per-document order-sensitive fingerprint of (kind, text, media_ref,
    offset) — equality of fingerprints before/after a pipeline proves the
    span-sequence invariant.  Computed JVM-side (no UDF)."""
    return docs.select(
        "doc_id",
        F.sha2(
            F.concat_ws(
                "",
                F.transform(
                    "spans",
                    lambda s: F.concat_ws(
                        "", s["kind"], s["text"], s["media_ref"],
                        s["offset"].cast("string"),
                    ),
                ),
            ),
            256,
        ).alias("span_fingerprint"),
    )


def transform_text_spans(docs: DataFrame, make_text) -> DataFrame:
    """Rewrite the ``text`` of text spans IN PLACE in the span sequence.

    ``make_text(span_struct_col) -> Column`` produces the new text.  The
    struct is rebuilt field by field and only ``text`` changes, and only
    where ``kind = 'text'`` — so (kind, media_ref, offset, order) are
    preserved BY CONSTRUCTION: the north-rule per-row invariant holds for
    any cleaner plugged in here.  Pure higher-order-function projection
    (``transform`` over the array) — whole-stage codegen, zero shuffle,
    no UDF: at 10^12 documents this is a map-only pass.
    """
    return docs.withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.when(s["kind"] == "text", make_text(s))
                .otherwise(s["text"])
                .alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )


def scrub_text_spans(docs: DataFrame) -> DataFrame:
    """PII-redact text spans of interleaved documents without touching
    media spans or span order — the compliance pass run where documents
    are STRUCTURED (the flat-text ``text.pii_scrub`` would destroy the
    media interleaving).  Patterns are the Spark∩DuckDB-safe set from
    :data:`..operators.text.PII_PATTERNS`, applied sequentially; idempotent
    (placeholders contain no redactable tokens)."""
    from ..operators.text import PII_PATTERNS

    def make_text(s):
        red = s["text"]
        for _name, pat, rep in PII_PATTERNS:
            red = F.regexp_replace(red, pat, rep)
        return red

    return transform_text_spans(docs, make_text)


def inject_span_pii(docs: DataFrame) -> DataFrame:
    """Deterministic PII salt for contract queries: every text span at
    offset % 3 == 0 gains an email + IPv4 derived from (doc_id, offset),
    so the scrub scores known positives and the SQL twin re-derives the
    identical injection."""
    return transform_text_spans(
        docs,
        lambda s: F.when(
            s["offset"] % 3 == 0,
            F.concat(
                s["text"],
                F.lit(" contact ops@"),
                F.col("doc_id"),
                F.lit(".example.com from 10.0.0."),
                s["offset"].cast("string"),
            ),
        ).otherwise(s["text"]),
    )
