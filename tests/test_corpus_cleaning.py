"""Fixture-level semantics for the round-6 corpus-cleaning pair:

- ``dedup.paragraph_dedup``: Gopher-style exact duplicate-paragraph
  removal — first occurrence in ``(doc_id, pos)`` total order survives,
  uniques untouched, rebuild preserves original order, fully-duplicated
  docs come back empty.
- ``text.c4_line_filters``: C4 line rules (terminal punctuation, >= 5
  words, no "javascript") and page rules (lorem ipsum, brace, >= 3
  surviving lines).

The corpus-scale behavior of both is gated against their DuckDB twins in
tests/test_contract_twins.py; these tests pin the rule edges with
hand-built docs where the expected output is computed by eye.
"""

from pyspark.sql import functions as F

from geetiles_spark.operators import dedup, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestParagraphDedup:
    def test_first_occurrence_wins_across_docs(self, spark):
        out = {
            r["doc_id"]: r
            for r in dedup.paragraph_dedup(
                _docs(
                    spark,
                    [
                        (1, "alpha\n\nshared para\n\nbeta"),
                        (2, "shared para\n\ngamma"),
                    ],
                )
            ).collect()
        }
        assert out[1]["n_removed"] == 0
        assert out[1]["text_clean"] == "alpha\n\nshared para\n\nbeta"
        assert out[2]["n_removed"] == 1
        assert out[2]["text_clean"] == "gamma"
        assert out[2]["n_paras"] == 2

    def test_first_occurrence_within_doc(self, spark):
        row = dedup.paragraph_dedup(
            _docs(spark, [(7, "x\n\nx\n\ny")])
        ).first()
        assert row["n_paras"] == 3 and row["n_removed"] == 1
        assert row["text_clean"] == "x\n\ny"

    def test_fully_duplicated_doc_empties(self, spark):
        out = {
            r["doc_id"]: r
            for r in dedup.paragraph_dedup(
                _docs(spark, [(1, "only para"), (2, "only para")])
            ).collect()
        }
        assert out[1]["text_clean"] == "only para"
        assert out[2]["text_clean"] == "" and out[2]["n_removed"] == 1

    def test_unique_corpus_is_identity(self, spark):
        rows = [(i, f"para {i} a\n\npara {i} b") for i in range(5)]
        out = dedup.paragraph_dedup(_docs(spark, rows)).collect()
        assert all(r["n_removed"] == 0 for r in out)
        got = {r["doc_id"]: r["text_clean"] for r in out}
        assert got == {i: t for i, t in rows}

    def test_partition_independence(self, spark):
        rows = [
            (i, " ".join(f"w{(i * 7 + j) % 5}" for j in range(6)))
            for i in range(40)
        ]
        base = _docs(spark, rows)
        a = sorted(
            map(tuple, dedup.paragraph_dedup(base.coalesce(1)).collect())
        )
        b = sorted(
            map(tuple, dedup.paragraph_dedup(base.repartition(16)).collect())
        )
        assert a == b


class TestC4LineFilters:
    def test_line_rules(self, spark):
        row = text.c4_line_filters(
            _docs(
                spark,
                [
                    (
                        1,
                        "this line has five words.\n"
                        "short line.\n"
                        "no terminal punctuation here at all\n"
                        "please enable JavaScript to continue now.\n"
                        'a quoted line of six words"\n'
                        "an exclamation line of five words!",
                    )
                ],
            )
        ).first()
        assert row["n_lines"] == 6
        # kept: words>=5 AND terminal [.!?"] AND no 'javascript'
        assert row["n_kept"] == 3
        assert row["text_clean"] == (
            "this line has five words.\n"
            'a quoted line of six words"\n'
            "an exclamation line of five words!"
        )
        assert row["keep_doc"] == 1

    def test_page_rules(self, spark):
        three_good = (
            "first good line of words.\n"
            "second good line of words.\n"
            "third good line of words."
        )
        out = {
            r["doc_id"]: r
            for r in text.c4_line_filters(
                _docs(
                    spark,
                    [
                        (1, three_good),
                        (2, three_good + "\nLorem Ipsum dolor sit amet."),
                        (3, three_good + "\nfunction() { return 1; }"),
                        (4, "only two good lines here.\nand a second one too."),
                    ],
                )
            ).collect()
        }
        assert out[1]["keep_doc"] == 1
        assert out[2]["keep_doc"] == 0  # lorem ipsum, case-insensitive
        assert out[3]["keep_doc"] == 0  # brace
        assert out[4]["keep_doc"] == 0  # < 3 surviving lines
        # text_clean still computed for dropped pages (audit trail)
        assert out[2]["text_clean"].startswith("first good line")


class TestCleaningIdempotence:
    """Both cleaners are idempotent — the fixed-point property that lets a
    100-TB pipeline re-run a stage after partial failure without tracking
    which partitions already passed through it."""

    def test_paragraph_dedup_idempotent(self, spark):
        rows = [
            (i, " ".join(f"w{(i * 3 + j) % 4}" for j in range(6)))
            for i in range(30)
        ]
        once = dedup.paragraph_dedup(_docs(spark, rows))
        again = dedup.paragraph_dedup(
            once.select("doc_id", F.col("text_clean").alias("text"))
        )
        a = {r["doc_id"]: r["text_clean"] for r in once.collect()}
        b = {
            r["doc_id"]: (r["text_clean"], r["n_removed"])
            for r in again.collect()
        }
        # after removal every surviving paragraph is globally unique
        # (except the empty-string paragraphs of fully-emptied docs,
        # which dedup again to the single first empty doc — exclude them)
        for did, (txt, nrem) in b.items():
            if a[did] != "":
                assert nrem == 0 and txt == a[did]

    def test_c4_idempotent(self, spark):
        docs = _docs(
            spark,
            [
                (
                    1,
                    "a good line of five words.\n"
                    "too short.\n"
                    "another good line of five words!\n"
                    "a third good line right here.\n"
                    "a fourth good line right here?",
                )
            ],
        )
        once = text.c4_line_filters(docs).first()
        again = text.c4_line_filters(
            _docs(spark, [(1, once["text_clean"])])
        ).first()
        assert again["n_lines"] == once["n_kept"]
        assert again["n_kept"] == once["n_kept"]
        assert again["text_clean"] == once["text_clean"]
        assert again["keep_doc"] == 1
