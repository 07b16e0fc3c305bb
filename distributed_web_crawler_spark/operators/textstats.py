"""Text-analysis operators for the training-data pipeline (task brief):
token counting, quality scoring, language-ID heuristic, fingerprinting.
All pure built-in Catalyst expressions — JVM-side, whole-stage codegen,
no Python in the hot path; each has an exact DuckDB oracle in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# deterministic marker-word sets for the language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}
# fixed stopword list for quality scoring
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def _words(text_col):
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def token_count_col(text_col):
    """Whitespace token count as a Column — the unit the packing manifest
    (operators/packing.py) budgets sequences in."""
    return F.size(_words(text_col))


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letters / digits / single
    punctuation), per SURVEY-brief 'token counting'."""
    return docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)).alias(
            "n_bpeish_tokens"
        ),
        F.length("text").alias("n_chars_measured"),
    )


def with_quality_cols(docs: DataFrame) -> DataFrame:
    """`docs` plus the quality columns (n_tokens, stopword_ratio,
    punct_ratio, quality_ok) — a NARROW per-row projection carrying the
    input columns through, so callers that need quality-gated doc
    columns never join back by doc_id (r9b, guide §1.2 fewer passes:
    q_clean_corpus_stats dropped a docs⋈quality self-join on this).
    quality_score() below is exactly this minus the carried doc columns
    — one definition of the gate, zero drift.

    r9: counts are STAGED into a projection before the ratio/gate math
    (guide §1.2) — the one-shot expression repeated the split ~4× and the
    stopword filter 2× per row (higher-order filters never codegen, so no
    subexpression elimination); multi-referenced aliases block
    CollapseProject from re-inlining. Same doubles, same gate."""
    carried = list(docs.columns)
    staged = docs.withColumn("_ws", _words(F.col("text")))
    base = staged.select(
        *carried,
        F.length("text").alias("_len"),
        F.size("_ws").alias("n_tokens"),
        F.size(F.filter(F.col("_ws"), lambda w: w.isin(STOPWORDS))).alias("_nstop"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?,;:]"), 0)).alias("_npunct"),
    )
    n_tok, n_stop = F.col("n_tokens"), F.col("_nstop")
    return base.select(
        *carried,
        "n_tokens",
        F.round(n_stop / n_tok, 4).alias("stopword_ratio"),
        F.round(F.col("_npunct") / F.col("_len"), 4).alias("punct_ratio"),
        ((n_tok >= 20) & (n_tok <= 2000) & (n_stop / n_tok < 0.5)).alias("quality_ok"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword ratios → a deterministic quality
    gate (see with_quality_cols — this is its doc_id-keyed projection)."""
    return with_quality_cols(docs.select("doc_id", "text")).select(
        "doc_id", "n_tokens", "stopword_ratio", "punct_ratio", "quality_ok"
    )


def lang_guess_col(text_col):
    """Marker-word language guess as a Column, deterministic tie-break
    order (en > de > fr > es > unknown) — shared by lang_id and the
    domain-mix reweighting (operators/packing.py)."""
    words = _words(text_col)

    def _hits(markers):
        # NB: the lambda must be unary — F.filter treats a second parameter
        # as the element *index*, silently breaking the predicate
        return F.size(F.filter(words, lambda w: w.isin(markers)))

    hits = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    return (
        F.when((hits["en"] > 0) & (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["es"]), "en")
        .when((hits["de"] > 0) & (hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"]), "de")
        .when((hits["fr"] > 0) & (hits["fr"] >= hits["es"]), "fr")
        .when(hits["es"] > 0, "es")
        .otherwise("unknown")
    )


def with_lang_guess(docs: DataFrame, out: str) -> DataFrame:
    """`docs` plus the marker-word language guess as column `out`, STAGED:
    the token split and each marker-set filter land in their own projection
    columns before the CASE reads them (r9, guide §1.2). The one-shot
    `lang_guess_col` expression repeats every `hits[lang]` subtree per CASE
    reference (~12 higher-order filter evaluations per row — they never
    enter whole-stage codegen, so no subexpression elimination applies);
    multi-referenced aliases block CollapseProject from re-inlining, so
    here the split runs once and each filter once. Same guess, same
    tie-break order, bit-identical output."""
    tmp = docs.withColumn("_lg_ws", _words(F.col("text")))

    def _flt(markers):
        # NB: must return a UNARY lambda — a second parameter (even a
        # defaulted one) makes F.filter bind it to the element INDEX
        return lambda w: w.isin(markers)

    for lang, markers in LANG_MARKERS.items():
        tmp = tmp.withColumn(
            f"_lg_{lang}", F.size(F.filter(F.col("_lg_ws"), _flt(markers)))
        )
    h = {lang: F.col(f"_lg_{lang}") for lang in LANG_MARKERS}
    guess = (
        F.when((h["en"] > 0) & (h["en"] >= h["de"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["es"]), "en")
        .when((h["de"] > 0) & (h["de"] >= h["fr"]) & (h["de"] >= h["es"]), "de")
        .when((h["fr"] > 0) & (h["fr"] >= h["es"]), "fr")
        .when(h["es"] > 0, "es")
        .otherwise("unknown")
    )
    return tmp.withColumn(out, guess).drop(
        "_lg_ws", *[f"_lg_{lang}" for lang in LANG_MARKERS]
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language guess — structurally the classic stopword-vote
    language-ID; marker sets are fixtures."""
    return with_lang_guess(docs.select("doc_id", "lang", "text"), "lang_guess").select(
        "doc_id", "lang", "lang_guess"
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over the lowercased alphanumeric skeleton —
    whitespace/punctuation-insensitive near-exact signature."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]", "")
    return docs.select("doc_id", F.md5(norm).alias("fp"))


CONTAM_N = 5  # words per overlap shingle (13-gram tokens at prod; 5 fits fixtures)
EVAL_MOD = 97  # deterministic "held-out benchmark" stand-in: doc_id % 97 == 0


def contamination_report(
    docs: DataFrame, eval_mod: int = EVAL_MOD, n: int = CONTAM_N, persisted: list | None = None
) -> DataFrame:
    """Training-data decontamination: flag every TRAINING doc sharing any
    n-word shingle with the held-out eval set (here the deterministic
    doc_id % eval_mod == 0 subset stands in for a benchmark suite).
    Output: (doc_id, n_hits, contaminated) for training docs only.

    Scale shape: the eval shingle-hash set is benchmark-sized (MBs even
    for large suites), so it BROADCASTS and the check is one map-side
    semi-join over the training shingles — no shuffle of the corpus, the
    same shape production decontamination runs at 100 TB."""
    from .dedup import shingles_hashed

    # persisted: Catalyst does not reuse the shingle subplan across the
    # eval-grams branch and the training-hits branch — without the cache
    # the corpus-wide explode+distinct shuffle runs twice (same fix as
    # dedup.jaccard_verified_pairs' cache_shingles). The CacheManager holds
    # the entry until unpersist/clearCache: pass `persisted` (a list) to
    # receive the handle for cleanup after the consuming action.
    # r9: shingles_hashed hashes BEFORE the distinct (guide §2.3) — the
    # dedup exchange and the cache carry 8-byte hashes, not gram strings;
    # this query already reduced to hash60 immediately after, so the only
    # semantic delta is the within-doc collision class documented there.
    sh = shingles_hashed(docs, n).select("doc_id", F.col("h").alias("g")).persist()
    if persisted is not None:
        persisted.append(sh)
    is_eval = F.pmod(F.col("doc_id"), F.lit(eval_mod)) == 0
    eval_grams = sh.filter(is_eval).select("g").distinct()
    hits = (
        sh.filter(~is_eval)
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )
    # hits is bounded by the CONTAMINATED doc count (≪ corpus): broadcast
    # it so the corpus side never shuffles for the final label attach
    return (
        docs.filter(~is_eval)
        .select("doc_id")
        .join(F.broadcast(hits), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# per-language sampling rates (percent) for the training-mix query —
# deterministic hash sampling, reproducible on any engine/cluster/run
SAMPLE_RATES = {"en": 60, "de": 30, "fr": 20, "es": 10}
SAMPLE_DEFAULT = 5  # any other language


def stratified_sample(docs: DataFrame, rates: dict | None = None, default: int = SAMPLE_DEFAULT) -> DataFrame:
    """Deterministic per-language stratified sample: keep a doc iff
    pmod(hash60('sample:' || doc_id), 100) < rate(lang). No RNG state —
    the sample is a pure function of doc_id, so it is identical across
    engines, partition counts, runs, and resumes (the property that makes
    a training-mix reproducible); rates are literal percentages per
    stratum. One narrow map + filter: no shuffle, no sampleBy seed."""
    from ..functions.portable_hash import hash60

    rates = SAMPLE_RATES if rates is None else rates
    rate = F.lit(default)
    for lang, pct in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    bucket = F.pmod(hash60(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), F.lit(100))
    return docs.filter(bucket < rate).select("doc_id", "lang", bucket.cast("int").alias("sample_bucket"))


def repetition_stats(docs: DataFrame, n: int = 2) -> DataFrame:
    """Gopher-style repetition filter inputs, per doc: total and distinct
    n-gram counts, the duplicate-n-gram fraction (1 - distinct/total), and
    the top-n-gram fraction (occurrences of the most frequent n-gram over
    total) — the two repetition signals Rae et al. (Gopher, 2021) threshold
    to drop looping/boilerplate documents.

    Shape: the statistics are LOCAL to each document, so they are computed
    in one Arrow-batched pass with ZERO shuffle (a Counter per doc) — the
    explode + groupBy(doc_id, gram) formulation shuffled every gram string
    of the corpus and cost 6x more at sf0.1. The count columns come out of
    Python; the FRACTIONS and their 4-dp rounding stay Spark expressions,
    so both engines round half-up identically (Python/numpy round is
    banker's and diverges on exact .xxxx5 rationals like 1/32). Docs with
    fewer than n tokens report zeros."""

    def rep(batches):
        import re
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                toks = re.split(r"\s+", str(text).strip().lower())
                if len(toks) >= n:
                    c = Counter(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
                    total, distinct, top = sum(c.values()), len(c), max(c.values())
                else:
                    total = distinct = top = 0
                rows.append(
                    {"doc_id": did, "n_grams": total, "n_distinct": distinct, "_top": top}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_grams", "n_distinct", "_top"])

    from ..operators.dedup import fan_out

    raw = fan_out(docs).select("doc_id", "text").mapInPandas(
        rep, schema="doc_id long, n_grams long, n_distinct long, _top long"
    )
    nz = F.col("n_grams") > 0
    return raw.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.round(
            F.when(nz, 1 - F.col("n_distinct") / F.col("n_grams")).otherwise(F.lit(0.0)), 4
        ).alias("dup_gram_frac"),
        F.round(F.when(nz, F.col("_top") / F.col("n_grams")).otherwise(F.lit(0.0)), 4).alias(
            "top_gram_frac"
        ),
    )


def line_dedup_stats(docs: DataFrame, min_count: int = 3) -> DataFrame:
    """C4-style line-level dedup signals: split each doc into lines
    (period-separated, trimmed, empties dropped), count each line's
    occurrences CORPUS-WIDE, and report per doc how many of its lines are
    boilerplate (appearing >= min_count times anywhere) plus the
    boilerplate fraction — the statistic C4 (Raffel et al., 2020)
    thresholds to strip repeated footers/menus/disclaimers.

    Scale shape: lines are hashed (portable md5-60) BEFORE the count
    shuffle so only 8-byte keys ride the exchange; the per-doc rollup
    joins hash->count back to the doc's lines. Docs with no lines report
    zeros."""
    from ..functions.portable_hash import hash60

    lines = F.filter(
        F.transform(F.split(F.col("text"), r"\."), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    from ..operators.dedup import fan_out

    sents = fan_out(docs).select("doc_id", F.explode(lines).alias("s")).select(
        "doc_id", hash60(F.col("s")).alias("h")
    )
    counts = sents.groupBy("h").agg(F.count("*").alias("c"))
    per = (
        sents.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum((F.col("c") >= min_count).cast("int")).cast("long").alias("n_boilerplate"),
        )
    )
    nz = F.col("n_lines") > 0
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
            F.coalesce(F.col("n_boilerplate"), F.lit(0)).alias("n_boilerplate"),
            F.round(
                F.when(nz, F.col("n_boilerplate") / F.col("n_lines")).otherwise(F.lit(0.0)), 4
            ).alias("boilerplate_frac"),
        )
    )


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-doc top-k terms by tf-idf — the classic crawler-downstream
    ranking statistic (a crawl corpus feeds a search index; Salton &
    Buckley, 1988). Scored with the RATIONAL idf variant
    score = tf * N / df (N = docs with >= 1 token): monotone in
    (tf, 1/df) exactly like log-idf for ranking purposes, but
    transcendental-free, so the DuckDB oracle reproduces every double
    bit-for-bit (same discipline as the jaccard / domain-mix oracles;
    ln() differs across libm implementations in the last ulp).

    100-TB shape: the token explode is narrow (fan_out spreads the doc
    scan first); tf is one map-side-combinable agg by (doc_id, term); df
    is a second partial agg OVER THE ALREADY-AGGREGATED (doc_id, term)
    rows (never a window over term partitions — 'the' would materialize
    an N-row partition); N broadcasts as a one-row aggregate; the
    stopword-skewed tf-by-term join is AQE skew-split; the final top-k
    is a doc-partitioned rank Spark 4 pushes down as WindowGroupLimit
    (plan-asserted), so only ~k rows per doc survive the last shuffle."""
    from pyspark.sql import Window

    from ..operators.dedup import fan_out

    tok = (
        fan_out(docs)
        .select("doc_id", F.explode(_words(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = tf.select(F.countDistinct("doc_id").alias("n_docs"))
    rnk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    )
    return (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn("score", F.round(F.col("tf") * F.col("n_docs") / F.col("df"), 6))
        .withColumn("rnk", rnk)
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


def length_quantiles(docs: DataFrame, quantiles=((50, 1, 2), (90, 9, 10), (99, 99, 100))) -> DataFrame:
    """Exact per-language doc-length quantiles — the corpus quality-
    distribution report every filtering pipeline is tuned against
    (Gopher/C4 publish these as length cutoffs). Each quantile is a true
    ORDER STATISTIC: the value at 1-based rank ((n−1)·num) DIV den + 1 —
    pure integer arithmetic, so the oracle matches bit-for-bit (a float
    p-multiply like (n−1)*0.99 floors differently across engines when the
    product grazes an integer).

    100-TB shape: NEVER a per-language sort/window over the raw docs (one
    'en' partition would be a single task holding most of the corpus).
    Instead: (lang, n_chars) HISTOGRAM via a map-side-combinable agg —
    bounded by |langs|×|distinct lengths| — then the cumulative-count
    window and rank probes run on the tiny histogram. quantiles entries
    are (percent_label, num, den) with p = num/den."""
    h = docs.groupBy("lang", "n_chars").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = h.select("lang", "n_chars", F.sum("cnt").over(w).alias("cum"))
    tot = h.groupBy("lang").agg(F.sum("cnt").alias("n_docs"))
    j = cum.join(F.broadcast(tot), "lang")
    aggs = []
    for label, num, den in quantiles:
        rank = F.expr(f"(n_docs - 1) * {num} DIV {den} + 1")
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("n_chars"))).alias(f"p{label}")
        )
    return j.groupBy("lang", "n_docs").agg(*aggs).select(
        "lang", F.col("n_docs").cast("long").alias("n_docs"), *[f"p{q[0]}" for q in quantiles]
    )


def top_bigrams(docs: DataFrame, k: int = 100) -> DataFrame:
    """Corpus-level top-k bigrams — the n-gram LM / boilerplate-phrase
    statistic (repeated navigation phrases dominate a crawl's bigram
    head). Tokens via the shared `_words` split; adjacent pairs built
    JVM-side with transform+slice (no Python); count ties break on the
    bigram string so the top-k is deterministic.

    100-TB shape: explode feeds ONE map-side-combinable count agg (the
    bigram head is massively combinable — 'of the' collapses per task
    before the shuffle); the final top-k is orderBy+limit =
    TakeOrderedAndProject (per-partition heaps + a k-row driver merge),
    never a global sort."""
    from ..operators.dedup import fan_out

    toks = fan_out(docs).select(_words(F.col("text")).alias("t"))
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                " (x, i) -> concat(x, ' ', t[i + 1]))"
            )
        ).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(k)
    )
