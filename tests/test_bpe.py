"""Distributed BPE (operators/bpe.py) vs an independent in-test reference
implementation (plain Counter loops — written against the published
algorithm, not against the operator), plus the scale laws: bounded working
set, partition independence, JVM-only training plan."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from geetiles_spark.operators import bpe

CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "low lower lowest",
    "newer newest new",
    "the the the banana bandana",
    "cats rats mats bats",
    "running runner ran",
    "banana bandana cabana",
] * 3


def ref_train(texts: list[str], n: int) -> list[tuple[str, str]]:
    vocab: Counter = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w) + [bpe.END])] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n):
        pc: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        m = max(pc.values())
        if m < 2:
            break
        pair = sorted(p for p, c in pc.items() if c == m)[0]
        merges.append(pair)
        a, b = pair
        new: Counter = Counter()
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += f
        vocab = new
    return merges


def _docs(spark, texts=CORPUS, n_parts=None):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return df.repartition(n_parts) if n_parts else df


class TestBpeTrain:
    def test_matches_reference_24_merges(self, spark):
        got = bpe.bpe_train(_docs(spark), n_merges=24, vocab_words=256)
        assert got == ref_train(CORPUS, 24)

    def test_partition_independent(self, spark):
        a = bpe.bpe_train(_docs(spark, n_parts=1), n_merges=10, vocab_words=256)
        b = bpe.bpe_train(_docs(spark, n_parts=7), n_merges=10, vocab_words=256)
        assert a == b

    def test_overlap_semantics(self, spark):
        """'aaa' + merge (a,a): greedy left-to-right -> (aa)a, so the next
        round can learn (aa, a) — the published overlap rule."""
        texts = ["aaa aaa aaa bb bb"]
        got = bpe.bpe_train(_docs(spark, texts), n_merges=3, vocab_words=16)
        assert got == ref_train(texts, 3)

    def test_stops_when_no_pair_repeats(self, spark):
        texts = ["ab cd ef"]
        got = bpe.bpe_train(_docs(spark, texts), n_merges=50, vocab_words=16)
        assert got == ref_train(texts, 50)
        assert len(got) < 50

    def test_vocab_cap_bounds_working_set(self, spark):
        """The iteration table never exceeds vocab_words rows — the bound
        that makes 100-TB training cost one corpus job + small rounds."""
        words = bpe.word_symbol_table(_docs(spark), vocab_words=5)
        assert words.count() == 5

    def test_training_plan_is_jvm_only(self, spark):
        """Neither the pair count nor the fold merge runs Python."""
        words = bpe.word_symbol_table(_docs(spark), vocab_words=64)
        for df in (bpe.pair_table(words), bpe._apply_merge(words, "t", "h")):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "BatchEvalPython" not in plan
            assert "ArrowEvalPython" not in plan

    def test_distributed_primitives_agree_with_driver_rounds(self, spark):
        """The SQL-oracled distributed surfaces (pair_table zip_with agg,
        _apply_merge fold) compute exactly what the driver rounds compute:
        round-0 argmax identical, and the fold-merged symbol multiset
        equals the driver merge."""
        words = bpe.word_symbol_table(_docs(spark), vocab_words=256)
        top = (
            bpe.pair_table(words)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()[0]
        )
        merges = bpe.bpe_train(_docs(spark), n_merges=1, vocab_words=256)
        assert (top["a"], top["b"]) == merges[0]

        a, b = merges[0]
        fold = sorted(
            (tuple(r["syms"]), r["freq"])
            for r in bpe._apply_merge(words, a, b).collect()
        )
        driver = []
        for r in words.collect():
            syms = list(r["syms"])
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            driver.append((tuple(out), r["freq"]))
        assert fold == sorted(driver)

    def test_resumable_from_catalog(self, spark, tmp_path):
        """North-rule resume: a job stopped after its last commit continues
        from the committed rank and lands on the identical merge list."""
        from geetiles_spark.catalog import Catalog

        cat = Catalog(str(tmp_path))
        full = bpe.bpe_train(_docs(spark), n_merges=12, vocab_words=256)
        # simulate a crash after 8 rounds: train with n_merges=8 committing
        partial = bpe.bpe_train(
            _docs(spark), n_merges=8, vocab_words=256,
            catalog=cat, table="m", checkpoint_every=4,
        )
        assert partial == full[:8]
        assert cat.commit_meta("m")["rounds"] == 8
        # restart: resumes from the snapshot, finishes the remaining rounds
        resumed = bpe.bpe_train(
            _docs(spark), n_merges=12, vocab_words=256,
            catalog=cat, table="m", checkpoint_every=4,
        )
        assert resumed == full
        assert cat.commit_meta("m")["done"] is True
        assert cat.commit_meta("m")["rounds"] == 12


class TestBpeEncode:
    def test_reconstruction(self, spark):
        merges = bpe.bpe_train(_docs(spark), n_merges=24, vocab_words=256)
        out = {r["doc_id"]: r for r in bpe.bpe_encode(_docs(spark), merges).collect()}
        for i, t in enumerate(CORPUS):
            rebuilt = "".join(
                tok.replace(bpe.END, " ") for tok in out[i]["tokens"]
            ).strip()
            assert rebuilt == " ".join(t.split())
            assert out[i]["n_tokens"] == len(out[i]["tokens"])

    def test_more_merges_fewer_tokens(self, spark):
        d = _docs(spark)
        m24 = bpe.bpe_train(d, n_merges=24, vocab_words=256)
        n0 = bpe.bpe_encode(d, []).agg(F.sum("n_tokens")).first()[0]
        n24 = bpe.bpe_encode(d, m24).agg(F.sum("n_tokens")).first()[0]
        assert n24 < n0

    def test_encode_applies_merges_in_rank_order(self, spark):
        """A lower-rank merge wins even when a higher-rank one overlaps."""
        # merges: (a,b) rank 0, (b,c) rank 1; word 'abc' -> ab + c
        out = bpe.bpe_encode(
            _docs(spark, ["abc"]), [("a", "b"), ("b", "c")]
        ).first()
        assert out["tokens"] == ["ab", "c", bpe.END]
