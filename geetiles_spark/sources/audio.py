"""Audio modality source: opaque PCM ``binary`` payloads with typed
metadata (the ``input_hint`` multimodal-column shape, audio flavor).

Real codecs (mp3/flac/opus) are absent from this environment — like the
image/video codecs they would be a library call inside the same Arrow batch
— but RAW PCM needs no library: int16 little-endian samples decode with one
``np.frombuffer``.  So unlike the stubbed compressed branches in
:mod:`..operators.multimodal`, the audio path is REAL end to end: this
module synthesizes byte payloads, :func:`..operators.multimodal.audio_stats`
decodes and reduces them, and the closed-form waveform
(``((seed + 7919*i) % 65536) - 32768``, seed = the 48-bit
:func:`..sources.datasets.pattern_seed`) makes the whole path re-derivable
in DuckDB SQL (``functions.oracle_sql.audio_stats_pattern_oracle_sql``) —
byte-level decode included, since any decode error changes the stats.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .datasets import pattern_seed

AUDIO_SCHEMA = (
    "tile_id string, dataset string, sample_rate int, n_samples int, "
    "payload binary"
)


def generate_audio(
    tiles: DataFrame,
    dataset: str = "patternpcm-2020",
    n_samples: int = 1600,
    sample_rate: int = 16000,
) -> DataFrame:
    """One PCM clip per tile: int16-LE bytes of the closed-form waveform.

    Arrow-batched; the per-tile seed keys the waveform so clips are
    deterministic and independent of partitioning."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            rows = []
            for tid in pdf["tile_id"]:
                s = pattern_seed(tid, dataset)
                wave = (((s + 7919 * i) % 65536) - 32768).astype("<i2")
                rows.append(
                    {
                        "tile_id": tid,
                        "dataset": dataset,
                        "sample_rate": sample_rate,
                        "n_samples": n_samples,
                        "payload": wave.tobytes(),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return tiles.select("tile_id").mapInPandas(gen, AUDIO_SCHEMA)
