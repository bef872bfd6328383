"""Text-analysis operators for training-data pipelines — all pure column
expressions (whole-stage codegen, zero Python in the hot path), each with an
exact ANSI-SQL twin for the DuckDB oracle.

- quality scoring: length / token / stopword / punctuation ratios
- language-ID: marker-word heuristic (deterministic, n-gram-free variant)
- token counting: whitespace and regex ("BPE-ish") tokenizations
- document fingerprinting: min-hash-of-shingles rolling fingerprint
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .partitioning import spread

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]
_LANG_MARKERS = [
    ("en", ["the", "and", "of"]),
    ("es", ["el", "la", "de"]),
    ("fr", ["le", "la", "et"]),
    ("de", ["der", "die", "und"]),
]


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality metrics (rounded to 6 for cross-engine parity)."""
    toks = F.split(F.col(text_col), " ")
    n_toks = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS]))
    )
    n_chars = F.length(text_col)
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars_m"),
        n_toks.alias("n_tokens"),
        F.round(n_chars / n_toks, 6).alias("avg_token_len"),
        F.round(stop_hits / n_toks, 6).alias("stopword_ratio"),
        F.round(alpha_chars / n_chars, 6).alias("alpha_ratio"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic marker-word language guess: the language with the most
    marker-token hits wins; ties (and zero hits) fall back to 'und'.  Scored
    per token so it is expressible identically in SQL."""
    toks = F.split(F.col(text_col), " ")
    s = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*[F.lit(m) for m in markers])))
        for lang, markers in _LANG_MARKERS
    }
    # deterministic cascade (earlier language wins ties) — identical CASE in SQL
    pred = (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["de"]) & (s["en"] > 0), F.lit("en"))
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["de"]) & (s["es"] > 0), F.lit("es"))
        .when((s["fr"] >= s["de"]) & (s["fr"] > 0), F.lit("fr"))
        .when(s["de"] > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )
    return docs.select(F.col(id_col).alias("doc_id"), pred.alias("lang_pred"))


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens and a regex word/number tokenization count."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[a-z]+|[0-9]+"), 0)).alias(
            "re_tokens"
        ),
    )


def fingerprints(
    docs: DataFrame, shingle_n: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Rolling-hash document fingerprint: the minimum md5 over all character
    n-gram shingles (winnowing's global-min special case) plus the shingle
    count — content-addressed near-identity for fast prefiltering."""
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text_col) - (shingle_n - 1), F.lit(1))),
        lambda i: F.md5(F.substring(F.col(text_col), i, shingle_n)),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_min(sh).alias("fingerprint"),
        F.size(sh).alias("n_shingles"),
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition metrics — the standard
    curation filter family alongside :func:`quality_scores` (docs dominated
    by repeated words/phrases are boilerplate or spam):

    - ``dup_word_frac``   = 1 - distinct_words / total_words
    - ``top_word_frac``   = occurrences of the most frequent word / total
    - ``dup_2gram_frac``  = 1 - distinct_bigrams / total_bigrams (0 when
      fewer than 2 words)

    Physical plan: word stats go explode -> (doc, word) count -> per-doc
    agg (both aggs map-side combined; the one shuffle carries (doc, word)
    pairs).  Bigram stats stay INSIDE the row (array expressions over the
    split — per-doc arrays are small, so the interpreted HOF cost is
    bounded) and join back on the doc id.  Rounded to 6 for cross-engine
    parity with the DuckDB oracle.
    """
    docs = spread(docs.select(F.col(id_col), F.col(text_col)), key=id_col)
    toks_arr = F.filter(
        F.split(F.col(text_col), " "), lambda t: F.length(t) > 0
    )
    words = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(toks_arr).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("cnt").alias("top_cnt"),
        )
    )
    # the token array must be an ATTRIBUTE inside the bigram lambda:
    # Catalyst does no CSE across lambda boundaries, so an inlined
    # filter(split(text)) would re-evaluate per element — O(n^2) per doc
    ta = F.col("_ta")
    bigrams = F.when(
        F.size(ta) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ta) - 1),
            lambda i: F.concat(
                F.element_at(ta, i), F.lit(" "), F.element_at(ta, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = docs.select(
        F.col(id_col).alias("doc_id"), toks_arr.alias("_ta")
    ).select(
        "doc_id",
        F.size(bigrams).alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct_bg"),
    )
    return (
        words.join(bg, "doc_id")
        .select(
            "doc_id",
            "n_words",
            F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 6).alias(
                "dup_word_frac"
            ),
            F.round(F.col("top_cnt") / F.col("n_words"), 6).alias("top_word_frac"),
            F.round(
                F.when(
                    F.col("n_bigrams") > 0,
                    1.0 - F.col("n_distinct_bg") / F.col("n_bigrams"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_2gram_frac"),
        )
    )


def ngram_contamination(
    docs: DataFrame,
    eval_ids: list,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Text-level eval-set decontamination — the GPT-3/LLaMA-style n-gram
    collision rule (13-grams at production scale; ``n`` parameterized for
    the fixture): a training document is contaminated if it shares ANY
    distinct word n-gram with any eval document.

    Output (doc_id, n_shared, contaminated) over the NON-eval corpus,
    where ``n_shared`` counts the distinct grams a doc shares with the
    union of eval grams.

    Physical plan: the eval gram set is tiny by construction (a few eval
    docs) -> broadcast left-semi join against the corpus gram stream (one
    explode, no shuffle), then a map-side-combined per-doc count.  The
    corpus never self-joins — contrast :func:`~.dedup.ngram_jaccard_pairs`
    which compares all pairs.
    """
    # token array hoisted to an attribute — no CSE across lambda
    # boundaries, so an inlined split(text) would re-run per gram
    tok = F.col("_tk")
    grams_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(tok) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)),
        )
    )
    grams = spread(docs.select(F.col(id_col), F.col(text_col)), key=id_col).select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_tk"),
    ).select("doc_id", F.explode(grams_arr).alias("gram"))
    lits = [F.lit(e) for e in eval_ids]
    eval_grams = grams.filter(F.col("doc_id").isin(*lits)).select("gram").distinct()
    shared = (
        grams.filter(~F.col("doc_id").isin(*lits))
        .join(F.broadcast(eval_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        docs.filter(~F.col(id_col).isin(*lits))
        .select(F.col(id_col).alias("doc_id"))
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    n_bins: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence packing — the training-batch preparation step: greedy
    first-fit of documents into fixed-capacity context windows.

    Docs hash into ``n_bins`` independent bins (md5-based, so the DuckDB
    oracle reproduces the assignment; xxhash64 has no DuckDB counterpart);
    within a bin, docs are taken in id order and appended to the current
    window while the whitespace-token count fits, else a new window opens
    (a doc longer than ``capacity`` occupies a window alone).  Output
    (doc_id, bin, window_id, n_tokens, offset) — ``offset`` is the doc's
    token start inside its window.

    Scale shape: packing is inherently sequential, so the BIN is the unit
    of parallelism — ``n_bins`` scales with the cluster while each bin
    packs deterministically (independent of Spark partitioning) inside one
    ``applyInPandas`` group.  The per-bin greedy scan is a Python loop
    (~1s per million docs), so ``n_bins`` bounds BOTH parallelism and the
    per-task wall: the default is the session's ``defaultParallelism``
    (= cluster cores), and at 10^12 docs callers should size
    ``n_bins >= total_docs / ~10^7`` so no bin's loop exceeds seconds.
    Bins-vs-determinism contract: output depends on ``n_bins`` (a doc's
    bin changes with the modulus), so fix ``n_bins`` explicitly wherever
    bit-reproducibility across differently-sized clusters matters — the
    md5 bin rule itself is partition- and cluster-size-independent.
    """
    import numpy as np
    import pandas as pd

    if n_bins is None:
        n_bins = max(docs.sparkSession.sparkContext.defaultParallelism, 1)
    toks = F.split(F.col(text_col), " ")
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(h, F.lit(n_bins)).cast("int").alias("bin"),
        F.size(toks).alias("n_tokens"),
    )

    def pack(key: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        t = pdf["n_tokens"].to_numpy(dtype=np.int64)
        win = np.zeros(len(t), dtype=np.int64)
        off = np.zeros(len(t), dtype=np.int64)
        cum = 0
        w = 0
        for i in range(len(t)):
            if i > 0 and cum + t[i] > capacity:
                w += 1
                cum = 0
            win[i] = w
            off[i] = cum
            cum += t[i]
        out = pdf.copy()
        out["window_id"] = win
        out["offset"] = off
        return out[["doc_id", "bin", "window_id", "n_tokens", "offset"]]

    # output id type follows the input id column (a literal 'doc_id long'
    # DDL broke string ids via Arrow cast — ADVICE r4)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", docs.schema[id_col].dataType),
            T.StructField("bin", T.IntegerType()),
            T.StructField("window_id", T.LongType()),
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )
    return staged.groupBy("bin").applyInPandas(pack, out_schema)


def mixture_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Domain-mixture reweighting — the DoReMi/Pile-style training-data
    primitive: keep a DIFFERENT deterministic fraction of each domain
    (``fractions[stratum]``; strata absent from the dict get
    ``default_fraction``).  Same md5-threshold predicate as
    :func:`stratified_sample` — partition-independent, reproducible across
    engines, pushable — with the per-stratum threshold selected by a CASE
    over ``stratum_col``, so the whole filter stays one whole-stage-codegen
    expression and a SQL twin replays it literally.  A doc kept at
    fraction f stays kept at any f' > f (nested samples: thresholds grow
    monotonically), which is what you want when re-tuning mixture weights
    between runs."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("/", F.lit(str(seed)), F.col(id_col).cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    hv = F.pmod(h, F.lit(1_000_000))
    thresh = F.lit(int(default_fraction * 1_000_000))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(stratum_col) == stratum, F.lit(int(frac * 1_000_000))
        ).otherwise(thresh)
    return docs.filter(hv < thresh)


def stratified_sample(
    docs: DataFrame,
    fraction: float,
    seed: int = 42,
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a doc iff
    ``int(md5('{seed}/{id}')[:15], 16) mod 1e6 < fraction * 1e6`` —
    partition-independent, reproducible across engines (the SQL twin applies
    the literally identical predicate; Spark's xxhash64 has no DuckDB
    counterpart), and ~``fraction`` of every stratum without a shuffle
    (contrast ``df.sample``: seed-stable only for a fixed partitioning).
    The digest keyspace is uniform, so per-stratum rates concentrate around
    ``fraction`` by Chernoff — the standard web-scale sampling shape.
    ``stratum_col`` documents intent (rates hold per stratum by hash
    uniformity); the predicate itself is stratum-agnostic."""
    thresh = int(fraction * 1_000_000)
    h = F.conv(
        F.substring(F.md5(F.concat_ws("/", F.lit(str(seed)), F.col(id_col).cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    return docs.filter(F.pmod(h, F.lit(1_000_000)) < F.lit(thresh))


# PII patterns — kept to the Java-regex ∩ RE2 common subset (char classes,
# bounded repetition, \b word boundaries; no lookaround, no backrefs) so the
# EXACT same pattern string runs in Spark (java.util.regex) and in the
# DuckDB oracle (RE2).  Order matters: replacement is sequential, and the
# oracle applies the identical chain.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
]


def pii_scrub(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII detection + redaction — the compliance pass every training-data
    pipeline runs before anything else touches the text (C4/RefinedWeb-style
    regex scrubbing; no reference analog — the reference never handles
    text): emails, IPv4 addresses, and international phone numbers are
    counted and replaced with typed placeholder tokens.

    Output: ``(doc_id, n_email, n_ipv4, n_phone, text_redacted)``.  Counts
    are independent per pattern over the RAW text (an IP inside an email is
    counted by both scanners); ``text_redacted`` applies the replacements
    sequentially in :data:`PII_PATTERNS` order, so earlier placeholders are
    opaque to later patterns.

    Scale shape: one projection of regexp expressions — whole-stage
    codegen, no shuffle, no Python, pushdown-transparent.  At 100 TB this
    is a pure map stage whose cost is the regex scan itself; production
    swaps in additional patterns (SSNs, IBANs, street addresses) as more
    rows of :data:`PII_PATTERNS` with zero plan change.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat, _rep in PII_PATTERNS
    ]
    red = F.col(text_col)
    for _name, pat, rep in PII_PATTERNS:
        red = F.regexp_replace(red, pat, rep)
    return docs.select(
        F.col(id_col).alias("doc_id"), *counts, red.alias("text_redacted")
    )


def vocab_topk(
    docs: DataFrame,
    k: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-vocabulary building: the top-``k`` corpus tokens by
    frequency with corpus-fraction and cumulative coverage — the
    frequency-table step every tokenizer build (BPE, WordPiece, unigram-LM)
    starts from, and the coverage curve that picks the vocab size.

    Output: ``(rank, token, cnt, frac, cum_frac)`` ordered by rank; ties
    broken by token text so the ranking is total and engine-independent.
    ``frac``/``cum_frac`` rounded to 6.

    Scale shape: one explode + map-side-combined count (the only
    corpus-sized shuffle); top-k via orderBy().limit() =
    TakeOrderedAndProject (per-partition heaps of k, no global sort); the
    global token total rides a 1-row broadcast attach (Catalyst constant-
    folds the literal key into an Identity broadcast: k probe rows x one
    build row, O(k)).  The
    rank/cum_frac window runs over the k-row result only, never the vocab.
    """
    from pyspark.sql.window import Window

    counts = (
        spread(docs.select(F.col(id_col), F.col(text_col)), key=id_col)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    topk = (
        counts.orderBy(F.desc("cnt"), "token")
        .limit(k)
        .withColumn("_k", F.lit(1))
    )
    total = counts.agg(F.sum("cnt").alias("_tot")).withColumn("_k", F.lit(1))
    w = Window.orderBy(F.desc("cnt"), "token")
    return (
        topk.join(F.broadcast(total), "_k")
        .select(
            F.row_number().over(w).alias("rank"),
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("_tot"), 6).alias("frac"),
            F.round(
                F.sum("cnt").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                )
                / F.col("_tot"),
                6,
            ).alias("cum_frac"),
        )
        .orderBy("rank")
    )


def dsir_select(
    docs: DataFrame,
    target_col: str = "lang",
    target_value: str = "en",
    k: int = 100,
    n_buckets: int = 4096,
    seed: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling", arXiv:2302.03169): score every
    document by how much more likely it is under a hashed-n-gram model of
    the TARGET distribution (rows where ``target_col == target_value``)
    than under the raw-corpus model, then Gumbel-top-k sample — the
    standard "make web data look like the target domain" selection step.

        feature f      = unigrams + space-joined bigrams, hashed into
                         ``n_buckets`` buckets (md5-prefix hash, the
                         engine's cross-engine convention)
        log w(doc)     = sum over doc's feature OCCURRENCES of
                         ln p_t(f) - ln p_r(f), add-one smoothed
        score(doc)     = round(log w, 6) + Gumbel(seed, doc_id); the
                         top-k scores win (Gumbel-max trick == sampling
                         without replacement proportional to exp(log w))

    Output: the selected k rows ``(doc_id, log_w, score)`` ordered by
    (score desc, doc_id); both numbers rounded to 6 so the DuckDB twin
    value-hashes.

    Scale shape: one explode pass over tokens (O(total tokens)); the
    feature table is groupBy'd to at most ``n_buckets`` rows — the ONLY
    unpartitioned window in the job (the smoothing totals) runs over that
    bounded table, never over the corpus; scoring re-joins the stream to
    the bucket table (AQE broadcasts: <= n_buckets rows by construction);
    the final selection is orderBy().limit(k) which Spark executes as
    TakeOrderedAndProject — map-side partial top-k heaps, no global sort,
    no single-partition shuffle.  No driver action anywhere; the Gumbel
    noise is the deterministic md5 hash, so results are
    partition-count-independent.
    """
    from pyspark.sql.window import Window

    # token array hoisted; feature stream not persisted (two consumers) —
    # same lambda-CSE + cache-lock rationale as _dup_window_positions
    tok = F.col("t")
    bigrams = F.when(
        F.size(tok) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tok) - 1, F.lit(1))),
            lambda i: F.concat_ws(
                " ",
                F.element_at(tok, i.cast("int")),
                F.element_at(tok, (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = (
        spread(
            docs.select(F.col(id_col), F.col(target_col), F.col(text_col)),
            key=id_col,
        )
        .select(
            F.col(id_col).alias("doc_id"),
            (F.col(target_col) == target_value).alias("tgt"),
            F.split(F.col(text_col), " ").alias("t"),
        )
        .select(
            "doc_id",
            "tgt",
            F.explode(F.concat(tok, bigrams)).alias("feat"),
        )
        .select(
            "doc_id",
            "tgt",
            F.pmod(
                F.conv(F.substring(F.md5(F.col("feat")), 1, 15), 16, 10).cast("long"),
                F.lit(n_buckets),
            ).alias("bucket"),
        )
    )
    ft = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("tgt"), 1).otherwise(0)).alias("t_cnt"),
        F.count(F.lit(1)).alias("r_cnt"),
    )
    # smoothing totals: a window over the <= n_buckets-row feature table —
    # bounded by construction, never corpus-sized
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lr = ft.select(
        "bucket",
        (
            F.log((F.col("t_cnt") + 1.0) / (F.sum("t_cnt").over(w_all) + float(n_buckets)))
            - F.log((F.col("r_cnt") + 1.0) / (F.sum("r_cnt").over(w_all) + float(n_buckets)))
        ).alias("log_ratio"),
    )
    u = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("/", F.lit(f"g{seed}"), F.col("doc_id").cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long"),
            F.lit(1_000_000),
        )
        + 0.5
    ) / 1_000_000.0
    return (
        feats.join(lr, ["bucket"])
        .groupBy("doc_id")
        .agg(F.round(F.sum("log_ratio"), 6).alias("log_w"))
        .select(
            "doc_id",
            "log_w",
            F.round(F.col("log_w") - F.log(-F.log(u)), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )


def lm_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing_vocab: int = 65536,
) -> DataFrame:
    """CCNet-style n-gram language-model perplexity scoring (Wenzek et al.
    2020, arXiv:1911.00359): train a bigram LM on the corpus itself, then
    score every document — the classic "filter web text by LM perplexity"
    quality signal.  CCNet uses a pretrained KenLM; here the model is the
    corpus's own add-one-smoothed bigram MLE so the operator is
    self-contained and exactly reproducible, with the hashing-trick twist
    that the smoothing denominator uses a FIXED vocabulary size
    ``smoothing_vocab`` (65536 = a 16-bit hashed vocab) instead of the
    corpus's distinct-type count:

        P(w | c) = (count(c, w) + 1) / (count(c) + smoothing_vocab)

    That constant is what keeps the whole job collect-free — a
    corpus-derived V would need a global scalar (driver action or 1-row
    broadcast join) for zero modeling benefit.

    Tokens are single-space-split; each doc is scored as the BOS-anchored
    bigram chain (BOS, t1), (t1, t2), ..., so every doc contributes exactly
    ``n_tokens`` scored events.  Output: ``(doc_id, n_tokens, avg_logp,
    ppl)`` with ``avg_logp`` = mean natural-log probability (round 6) and
    ``ppl = exp(-avg_logp)`` (round 2 — exp amplifies last-ulp ln()
    differences between engines, so the headline number gets the coarser
    contract).

    Physical plan, O(total tokens) end-to-end: one posexplode emits the
    bigram stream; bigram and context counts are map-side-combined
    groupBys; scoring re-joins the stream to both count tables with plain
    equi-joins (every stream bigram exists in the model — inner join, no
    null path), then one per-doc aggregate.  No driver action, no pair
    blowup, no Python; AQE broadcasts the count tables when the corpus is
    small and shuffle-joins on (prev, cur) when it is not.  Hot contexts
    (stopwords) skew the ctx-count join at 100 TB; that join's build side
    is tiny (one row per distinct context) so AQE's skew split handles the
    probe side without salting.
    """
    # token array hoisted to an attribute (no CSE across lambda
    # boundaries) and the bigram stream deliberately NOT persisted — it
    # has three consumers, and lazily-cached blocks materialized by
    # AQE-concurrent map stages serialize behind the BlockManager write
    # lock (see _dup_window_positions, same measured pathology); three
    # cheap hoisted map passes beat caching an O(tokens) intermediate
    tok = F.col("t")
    big = (
        spread(docs.select(F.col(id_col), F.col(text_col)), key=id_col)
        .select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("t"),
        )
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size(tok)),
                    lambda i: F.struct(
                        F.when(i == 1, F.lit(""))
                        .otherwise(F.element_at(tok, (i - 1).cast("int")))
                        .alias("prev"),
                        F.element_at(tok, i.cast("int")).alias("cur"),
                    ),
                )
            ).alias("_i", "bg"),
        )
        .select("doc_id", "bg.prev", "bg.cur")
    )
    bc = big.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("bcnt"))
    cc = big.groupBy("prev").agg(F.count(F.lit(1)).alias("ccnt"))
    logp = F.log(
        (F.col("bcnt") + F.lit(1.0))
        / (F.col("ccnt") + F.lit(float(smoothing_vocab)))
    )
    return (
        big.join(bc, ["prev", "cur"])
        .join(cc, ["prev"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.round(F.avg(logp), 6).alias("avg_logp"),
            F.round(F.exp(-F.avg(logp)), 2).alias("ppl"),
        )
    )


def c4_line_filters(
    docs: DataFrame,
    min_words: int = 5,
    min_kept_lines: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style line + page cleaning (Raffel et al. 2020, arXiv:1910.10683
    §2.2, the rules that built the C4 corpus): a line survives iff it ends
    in a terminal punctuation mark (``. ! ? "``), has at least
    ``min_words`` whitespace words, and does not mention "javascript"
    (case-insensitive); the page itself is dropped when it contains
    "lorem ipsum" (case-insensitive) or a ``{`` (code marker), or when
    fewer than ``min_kept_lines`` lines survive.  Deliberate simplification
    vs the paper, named so the parity claim is honest: C4 counts three
    *sentences* for the page floor — this uses surviving *lines* (the
    paper's own unit for every other rule); the bad-words list is a
    production extension (more predicates in the same lambda, zero plan
    change).  No reference analog (the reference never handles text).

    Output: one row per input document — ``(doc_id, n_lines, n_kept,
    keep_doc, text_clean)``; ``text_clean`` is the surviving lines
    re-joined by newline (computed even for dropped pages, so downstream
    can audit what the page-level rules rejected).

    Scale shape: a pure projection — split, one ``F.filter`` lambda over
    the line array, concat_ws — whole-stage-free HOF but zero shuffle,
    zero Python, pushdown-transparent; at 100 TB this is a map-only pass
    whose cost is the line scan itself.  The line array is hoisted to an
    attribute first (Catalyst does no CSE across lambda boundaries — the
    repo-wide rule measured in BENCH/LLM_SCALING.md round-6 addendum 2).
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.split(F.col(text_col), "\n", -1).alias("_lines"),
    )

    def _keep(l):  # noqa: E741 - mirrors the paper's "line" naming
        last = F.substring(l, -1, 1)
        return (
            last.isin(".", "!", "?", '"')
            & (F.size(F.split(F.trim(l), " +")) >= min_words)
            & ~F.contains(F.lower(l), F.lit("javascript"))
        )

    kept = F.filter(F.col("_lines"), _keep)
    n_kept = F.size(kept)
    page_ok = (
        ~F.contains(F.lower(F.col("_text")), F.lit("lorem ipsum"))
        & ~F.contains(F.col("_text"), F.lit("{"))
        & (n_kept >= min_kept_lines)
    )
    return lines.select(
        "doc_id",
        F.size("_lines").cast("int").alias("n_lines"),
        n_kept.cast("int").alias("n_kept"),
        page_ok.cast("int").alias("keep_doc"),
        F.concat_ws("\n", kept).alias("text_clean"),
    )
