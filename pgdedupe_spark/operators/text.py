"""Text-analysis operators for training-data pipelines: quality scoring,
token counting, language ID, document fingerprinting (BASELINE.json north
star). All pure JVM column expressions — no Python in the hot path — and
each has an exactly-matching ANSI-SQL formulation for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared with the oracle SQL — keep in sync with registry.py
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "von"],
    "zh": ["de", "shi", "zai", "le", "he", "you", "wo", "ta", "men", "bu"],
}

TOKEN_RE = "[A-Za-z0-9]+"
PUNCT_RE = r"[^A-Za-z0-9\s]"
FP_MOD = 1_000_000_007


def tokens(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE.lower()), 0)


def token_count(col: Column) -> Column:
    """Whitespace/alnum token count (the BPE-ish regex tokenizer baseline)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), 0)).cast("bigint")


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), 0)).cast("bigint")


def stopword_hits(col: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t))).cast("bigint")


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features + a boolean quality gate (the standard
    Gopher-style length/punct/stopword heuristics, simplified)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks).cast("bigint")
    total_tok_chars = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    return df.select(
        F.col(id_col),
        F.length(t).cast("bigint").alias("n_chars_txt"),
        n_tok.alias("n_tokens"),
        punct_count(t).alias("n_punct"),
        (total_tok_chars / F.greatest(n_tok, F.lit(1))).alias("avg_token_len"),
        stopword_hits(t, "en").alias("en_stopword_hits"),
        (
            (n_tok >= 10)
            & (punct_count(t) * 2 < n_tok)
            & (total_tok_chars / F.greatest(n_tok, F.lit(1)) < 12)
        ).alias("quality_ok"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-profile argmax language ID with deterministic tie-break
    (hits desc, lang asc). N-gram-profile LID reduces to the same
    shape — per-language score expression + argmax."""
    t = F.col(text_col)
    scored = df.select(
        F.col(id_col),
        *[stopword_hits(t, lang).alias(f"_hits_{lang}") for lang in sorted(STOPWORDS)],
    )
    langs = sorted(STOPWORDS)
    pairs = F.array(
        *[
            F.struct((-F.col(f"_hits_{la}")).alias("neg"), F.lit(la).alias("lang"))
            for la in langs
        ]
    )
    best = F.array_min(pairs)  # struct compare: smallest neg-hits, then lang asc
    return scored.select(
        id_col,
        best["lang"].alias("pred_lang"),
        (-best["neg"]).cast("bigint").alias("hits"),
    )


def fingerprint(col: Column) -> Column:
    """Polynomial rolling hash over characters, mod 1e9+7 — a deterministic
    64-bit-safe document fingerprint with an exact SQL twin
    (list_reduce/list_transform in DuckDB)."""
    codes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(col), F.lit(1))),
        lambda i: F.ascii(F.substring(col, i, 1)).cast("bigint"),
    )
    return F.when(F.length(col) == 0, F.lit(0).cast("bigint")).otherwise(
        F.aggregate(
            codes,
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc * 31 + x) % FP_MOD,
        )
    )


def doc_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting two ways (training-data budget accounting):
    whitespace tokens, and a BPE-ish pre-tokenization — letter runs, single
    digits, or single non-alphanumeric symbols (the GPT-2 pre-tokenizer
    family, simplified to a regex both Java and RE2 dialects agree on)."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    bpe = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0))
    return df.select(
        F.col(id_col),
        ws.cast("bigint").alias("n_ws_tokens"),
        bpe.cast("bigint").alias("n_bpe_tokens"),
        F.length(t).cast("bigint").alias("n_chars"),
    )


def tfidf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-(doc, term) smoothed TF-IDF: ``tf * (ln((N+1)/(df+1)) + 1)``
    (scikit-style smoothing so unseen-term idf stays finite).

    Plan: explode tokens → (doc, term) count (one shuffle, map-side
    combine) → term document-frequency from the distinct (doc, term) frame
    (second aggregation on the term key) → join tf⋈df on term (AQE
    broadcasts the term dimension when it is small; on a web-scale corpus
    it shuffles hash-partitioned by term, which is also the natural layout
    for downstream per-term statistics). N is one count action over the
    corpus scan."""
    n_docs = df.count()
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("_df") + F.lit(1.0))) + F.lit(1.0)
    return (
        tf.join(dfreq, "term")
        .select("doc", "term", "tf", (F.col("tf") * idf).alias("tfidf"))
    )


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-LM quality score (the CCNet/Gopher perplexity-filter idea
    with the corpus itself as the language model): per document, the mean
    log-probability of its tokens under the corpus unigram distribution
    with add-one smoothing — ``p(t) = (count(t)+1) / (T+V)``. Documents
    full of rare/garbled tokens score far below prose; thresholding on
    ``mean_logprob`` is the quality gate.

    Plan: one explode → token-count aggregation builds the LM (hash-
    partitioned by token — the natural layout); per-doc scoring joins
    doc-term counts against it on the token key and averages (AQE
    broadcasts the vocabulary when small). Two scalar count actions (T,
    V) are single-row collects. Everything stays JVM-side; ties to the
    same ``tokens`` convention the rest of the text family pins."""
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    lm = toks.groupBy("term").agg(F.count(F.lit(1)).alias("_c"))
    totals = lm.agg(
        F.sum("_c").alias("_t"), F.count(F.lit(1)).alias("_v")
    ).collect()[0]
    t_plus_v = float((totals._t or 0) + (totals._v or 0)) or 1.0
    logp = F.log((F.col("_c") + F.lit(1.0)) / F.lit(t_plus_v))
    per_tok = toks.join(lm, "term").select("doc", logp.alias("_lp"))
    return (
        per_tok.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("_lp").alias("mean_logprob"),
        )
        .withColumnRenamed("doc", id_col)
    )


def bigram_logprob(
    df: DataFrame, id_col: str, text_col: str, train_df: DataFrame | None = None
) -> DataFrame:
    """Bigram-LM quality score — the KenLM/CCNet filter pattern one order
    up from :func:`unigram_logprob`: per document, the mean add-one-
    smoothed log-probability of its token TRANSITIONS,
    ``p(w2|w1) = (C(w1,w2)+1) / (C(w1)+V)``. Repetitive or garbled text
    scores far below prose even when its unigrams look normal (the
    failure mode the unigram gate misses).

    ``train_df`` is the actual CCNet deployment shape: train the LM on a
    trusted/clean corpus and score a candidate corpus against it
    (defaults to self-scoring). Unseen bigrams and unseen contexts fall
    back to the smoothed floor (numerator 1; context count 0), so
    scoring a disjoint-vocabulary document is well-defined and maximally
    penalized rather than an error.

    Output: (id, n_bigrams, mean_logprob); documents with fewer than two
    tokens emit n_bigrams=0 and NULL mean_logprob (no transitions to
    score — callers decide whether empty-ish docs pass the gate).

    Plan: one explode per side builds (w1, w2) transition streams via a
    JVM ``transform`` over the sliced token array (no Python, fan-out =
    tokens-1); the LM is two hash aggregations (bigram and context
    counts, token-partitioned — the natural 100 TB layout); scoring is
    two left joins against those counts (AQE broadcasts small LMs). The
    vocabulary size is the single collected scalar."""
    src = train_df if train_df is not None else df

    def transitions(d: DataFrame) -> DataFrame:
        return (
            d.select(F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_t"))
            .filter(F.size("_t") >= 2)
            .select(
                "doc",
                F.explode(
                    F.expr(
                        "transform(slice(_t, 1, size(_t) - 1),"
                        " (w, i) -> struct(w AS w1, element_at(_t, i + 2) AS w2))"
                    )
                ).alias("_b"),
            )
            .select("doc", F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
        )

    train = transitions(src)
    bigrams = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_cb"))
    contexts = bigrams.groupBy("w1").agg(F.sum("_cb").alias("_cw"))
    vocab = (
        src.select(F.explode(tokens(F.col(text_col))).alias("_w"))
        .agg(F.count_distinct("_w"))
        .collect()[0][0]
    )
    v = float(vocab or 1)

    score = transitions(df)
    logp = F.log(
        (F.coalesce(F.col("_cb"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("_cw"), F.lit(0)) + F.lit(v))
    )
    per_doc = (
        score.join(bigrams, ["w1", "w2"], "left")
        .join(contexts, "w1", "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(logp).alias("mean_logprob"),
        )
    )
    # docs with <2 tokens have no transition rows — re-attach with NULLs
    base = df.select(F.col(id_col).alias("doc"))
    return (
        base.join(per_doc, "doc", "left")
        .withColumn("n_bigrams", F.coalesce("n_bigrams", F.lit(0)))
        .withColumnRenamed("doc", id_col)
    )


# explicit codepoint ranges, not \p{Script} classes: the class SYNTAX
# differs between Java regex (Spark) and RE2 (DuckDB oracles), while
# literal ranges behave identically in both
_SCRIPT_RANGES = {
    "latin": "A-Za-z",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    "cjk": "一-鿿぀-ヿ가-힯",  # han + kana + hangul
    "digit": "0-9",
}


def script_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document writing-script profile: character counts per script
    family (Latin/Cyrillic/Greek/Arabic/CJK/digits) plus the dominant
    script — the standard multilingual-corpus filter signal upstream of
    the n-gram language_id above (script mismatch is the cheapest
    possible "wrong language" reject, and catches mojibake that n-gram
    models score as plausible).

    Counting is length(text) − length(regexp_replace(text, [range], ''))
    per family — pure codegen expressions, one projection, no explode,
    no shuffle. The dominant pick tie-breaks by the fixed family order
    via greatest-of-structs."""
    t = F.col(text_col)
    # coalesce: NULL text must profile as all-zero counts + 'none', and
    # the DuckDB oracle mirrors the same coalesce so both engines agree
    counts = {
        name: F.coalesce(
            (
                F.length(t) - F.length(F.regexp_replace(t, f"[{rng}]", ""))
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        )
        for name, rng in _SCRIPT_RANGES.items()
    }
    # dominant = argmax by (count, reverse fixed priority); struct max
    # keeps it a single expression. Priority: earlier in _SCRIPT_RANGES
    # wins ties (latin > cyrillic > ... by construction below).
    order = list(_SCRIPT_RANGES)
    dominant = F.greatest(
        *[
            F.struct(
                counts[name].alias("c"),
                F.lit(len(order) - i).alias("prio"),
                F.lit(name).alias("s"),
            )
            for i, name in enumerate(order)
        ]
    )["s"]
    return df.select(
        F.col(id_col),
        *[counts[name].alias(f"n_{name}") for name in order],
        F.when(
            sum(counts.values(), F.lit(0).cast("bigint")) > 0, dominant
        ).otherwise(F.lit("none")).alias("dominant_script"),
    )


# multi-part public suffixes the registered-domain heuristic recognizes
# (a pragmatic subset of the Public Suffix List — the full PSL is a data
# file a deployment drops in; the PARSE mechanics are identical). Shared
# with the oracle SQL via url_domain_regex() — keep in sync.
URL_MULTIPART_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


def url_domain_regex() -> str:
    """Regex extracting the registered domain from a bare hostname:
    label + multi-part suffix if the host ends in one, else the last two
    labels. One anchored pattern, identical semantics under Java regex
    (Spark) and RE2 (DuckDB) — both leftmost-first alternation."""
    alts = "|".join(s.replace(".", r"\.") for s in URL_MULTIPART_SUFFIXES)
    return rf"([^.]+\.(?:{alts})|[^.]+\.[^.]+)$"


def url_parse(df: DataFrame, url_col: str, prefix: str = "url_") -> DataFrame:
    """Decompose a URL column into ``{prefix}scheme/host/port/path/
    domain`` — the web-corpus curation primitive (per-domain quotas,
    blocklists, crawl dedup all key on the registered domain, not the
    raw URL). Pure JVM regexp projections, zero shuffle; malformed URLs
    yield NULL fields rather than errors (filter on
    ``{prefix}host IS NULL`` for the reject stream). Port is NULL when
    absent; path is '' for bare-host URLs.

    Case handling (ADVICE r7): scheme and host are case-insensitive per
    RFC 3986 §3.1/§3.2.2 — ``HTTPS://WWW.Example.COM/Path`` parses with
    scheme 'https', host 'www.example.com' (both canonically
    lowercased); the PATH keeps its original case (paths are
    case-sensitive). Out of scope: IP-literal hosts — a dotted-quad
    yields its last two octets as the 'domain' and a bracketed IPv6
    host is rejected by the host charset, both by design of the
    registered-domain heuristic (suffix-match on labels); route IPs
    through their own branch if they matter in your corpus."""
    clash = {f"{prefix}{s}" for s in ("scheme", "host", "port", "path", "domain")}
    if clash & set(df.columns):
        raise ValueError(f"input already has columns {sorted(clash & set(df.columns))}")
    u = F.col(url_col)
    lu = F.lower(u)
    scheme = F.nullif(F.regexp_extract(lu, r"^([a-z][a-z0-9+.-]*)://", 1), F.lit(""))
    auth = F.regexp_extract(lu, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    host = F.nullif(F.regexp_extract(auth, r"^(?:[^@]*@)?([^:]*)", 1), F.lit(""))
    port = F.nullif(F.regexp_extract(auth, r":([0-9]+)$", 1), F.lit("")).cast("int")
    path = F.regexp_extract(u, r"^(?i:[a-z][a-z0-9+.-]*)://[^/?#]*([^?#]*)", 1)
    domain = F.nullif(F.regexp_extract(host, url_domain_regex(), 1), F.lit(""))
    return (
        df.withColumn(f"{prefix}scheme", scheme)
        .withColumn(f"{prefix}host", host)
        .withColumn(f"{prefix}port", port)
        .withColumn(f"{prefix}path", F.when(host.isNull(), F.lit(None)).otherwise(path))
        .withColumn(f"{prefix}domain", domain)
    )


def domain_profile(df: DataFrame, url_col: str) -> DataFrame:
    """Per-registered-domain rollup: doc count, distinct hosts, docs
    carrying an explicit port, distinct schemes — the summary a
    per-domain quota/blocklist stage consumes. One parse projection +
    one aggregation keyed by domain."""
    parsed = url_parse(df, url_col)
    return parsed.groupBy(F.col("url_domain").alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("url_host").alias("n_hosts"),
        F.sum(F.col("url_port").isNotNull().cast("long")).alias("n_with_port"),
        F.count_distinct("url_scheme").alias("n_schemes"),
    )


# HTML entity decode order: named/numeric entities first, &amp; LAST —
# otherwise '&amp;lt;' would double-decode to '<'. The short list covers
# the entities that dominate crawl text; extend the pairs for full HTML5.
_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def html_to_text(df: DataFrame, html_col: str, out_col: str = "text_extracted") -> DataFrame:
    """Extract visible text from an HTML column — the first stage of any
    web-crawl curation pipeline (quality scoring, dedup, language id all
    operate on TEXT; running them on markup measures the boilerplate).

    Fixed, documented pass order (each a single JVM regexp/replace node;
    zero shuffle, zero Python — the whole chain stays in one codegen
    projection at the scan):

    1. strip comments ``(?s)<!--.*?-->`` (first — a comment may wrap
       script tags),
    2. strip script/style/noscript ELEMENTS incl. their content
       (``(?is)`` — case-insensitive, dot-all),
    3. strip every remaining tag ``<[^>]*>`` → space (block boundaries
       become whitespace, then collapse),
    4. decode the common entities (&amp; last so entity-escaped
       entities don't double-decode),
    5. collapse whitespace + trim.

    Lossy by design: tables/lists flatten to word soup and rare
    entities pass through verbatim — this is the curation-grade
    extractor, not a DOM renderer. Both Java regex and RE2 execute
    these exact patterns identically, so the op is oracle-checkable."""
    x = F.col(html_col)
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(
        x, r"(?is)<(script|style|noscript)\b[^>]*>.*?</(script|style|noscript)>", " "
    )
    x = F.regexp_replace(x, r"<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(rep))
    x = F.trim(F.regexp_replace(x, r"\s+", " "))
    return df.withColumn(out_col, x)


# ---------------------------------------------------------------------------
# Model-based quality filtering (r9): the GPT-3/CCNet-style learned quality
# classifier — a logistic regression over cheap text features separates
# reference-quality documents from crawl garbage, and the corpus is scored
# and filtered by the model rather than hand-tuned thresholds. Training is
# driver-side on a bounded labeled sample (the D4 asymmetry: fitting is
# tiny, scoring is the 100 TB scan); scoring reuses the JVM sigmoid
# expression, so the hot path has zero Python.
# ---------------------------------------------------------------------------

#: fixed feature layout — keep in sync with the oracle SQL (registry) and
#: any saved model (ml/persistence.py stores weights positionally)
QUALITY_FEATURES = (
    "len_sat",        # n_tokens / (n_tokens + 100): saturating length
    "stopword_ratio",  # en stopword hits / (n_tokens + 1)
    "punct_ratio",     # punct chars / (n_chars + 1)
    "avg_tok_len12",   # (total token chars / max(n_tokens,1)) / 12
    "digit_ratio",     # digit chars / (n_chars + 1)
    "upper_ratio",     # uppercase chars / (n_chars + 1)
)


def quality_feature_expr(text_col: str) -> Column:
    """array<double> of :data:`QUALITY_FEATURES` — every feature is one
    exact-integer count divided once, so each value is a single
    correctly-rounded IEEE division and a DuckDB oracle reproduces the
    whole vector bit-for-bit (no log/exp inside the features; the
    sigmoid's exp lives at the scoring boundary where the DECIMAL(18,6)
    rounding convention absorbs libm-vs-JVM last-ulp differences —
    the d4_pair_scores device)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks).cast("bigint")
    n_chars = F.length(t).cast("bigint")
    tok_chars = F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x))
    n_digit = F.size(F.regexp_extract_all(t, F.lit("[0-9]"), 0)).cast("bigint")
    n_upper = F.size(F.regexp_extract_all(t, F.lit("[A-Z]"), 0)).cast("bigint")
    d = lambda a, b: a.cast("double") / b.cast("double")  # noqa: E731
    return F.array(
        d(n_tok, n_tok + F.lit(100)),
        d(stopword_hits(t, "en"), n_tok + F.lit(1)),
        d(punct_count(t), n_chars + F.lit(1)),
        d(tok_chars, F.greatest(n_tok, F.lit(1))) / F.lit(12.0),
        d(n_digit, n_chars + F.lit(1)),
        d(n_upper, n_chars + F.lit(1)),
    )


def fit_quality_classifier(
    good: DataFrame,
    bad: DataFrame,
    text_col: str,
    sample: int = 2000,
    seed: int = 42,
    **hyper,
):
    """Fit the quality LR on bounded hash-ranked samples of labeled
    good/bad documents (driver-side numpy — the labeled set is small by
    construction; see operators/scoring.py for why). Returns the fitted
    classifier; persist/reload it with ``ml.persistence.save_model``-style
    weights or score directly via :func:`quality_model_scores`."""
    import numpy as np

    from pgdedupe_spark.operators.scoring import LogisticRegressionClassifier

    def collect_feats(df: DataFrame) -> list[list[float]]:
        rows = (
            df.select(
                quality_feature_expr(text_col).alias("_f"),
                F.xxhash64(F.lit(seed), F.col(text_col)).alias("_h"),
            )
            .orderBy("_h")
            .limit(int(sample))
            .collect()
        )
        return [[float(v) for v in r._f] for r in rows]

    xg, xb = collect_feats(good), collect_feats(bad)
    if not xg or not xb:
        raise ValueError("need non-empty good AND bad labeled sets")
    X = np.array(xg + xb)
    y = np.array([1.0] * len(xg) + [0.0] * len(xb))
    return LogisticRegressionClassifier(**hyper).fit(X, y)


def quality_model_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    clf,
    threshold: float | None = None,
) -> DataFrame:
    """(id, quality_score) for every document — sigmoid(w·features + b)
    as one JVM expression over :func:`quality_feature_expr` (whole-stage
    codegen, zero Python, one scan). ``threshold`` keeps only rows at or
    above it (the filter deployment shape); scores pass the
    DECIMAL(18,6) boundary BEFORE the threshold compare so the filter
    decision is engine-reproducible."""
    from pgdedupe_spark.operators.scoring import score_expr

    scored = df.select(
        F.col(id_col),
        quality_feature_expr(text_col).alias("_f"),
    ).select(
        id_col,
        score_expr(clf.weights, clf.bias, "_f")
        .cast("decimal(18,6)")
        .cast("double")
        .alias("quality_score"),
    )
    if threshold is not None:
        scored = scored.filter(F.col("quality_score") >= float(threshold))
    return scored


def llm_gate_filter(g: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The pipeline_llm_prep gate predicate over a gopher_quality frame —
    ONE definition shared by the batch composite (curation.llm_prep /
    registry pipeline_llm_prep) and the streaming twin
    (streaming.ops.curation_prep_stream): rules 1-3 and 6 of MassiveText
    A1.1; the required-words rule is waived for the synthetic corpus
    exactly as the registry composite documents. ``id_col`` names the
    id column gopher_quality preserved (review r11: a hard-coded
    "doc_id" broke every non-doc_id caller at plan time)."""
    return g.filter(
        (F.col("n_words") >= 50) & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len") >= 3.0) & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_ratio") <= 0.1) & (F.col("frac_alpha_words") >= 0.8)
    ).select(id_col)


GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher rule-based quality filter (Rae et al. 2021, §A1.1 — the
    heuristic gate MassiveText applies before any learned filter; also the
    core of RefinedWeb/Dolma's rule tier). Per document, the seven rule
    signals and the conjunctive ``keep`` verdict:

    1. 50 ≤ word count ≤ 100,000
    2. 3 ≤ mean word length ≤ 10
    3. symbol-to-word ratio ≤ 0.1  (symbols: '#' and ellipsis '…'/'...')
    4. < 90% of lines start with a bullet ('•', '-', '*')
    5. ≤ 30% of lines end with an ellipsis
    6. ≥ 80% of words contain at least one alphabetic character
    7. at least 2 distinct hits among the 8 required English stop words

    Everything is per-row array/string expressions inside codegen — no
    joins, no aggregation, no Python; embarrassingly parallel at any
    scale. Ratios divide exact per-row integers, so there is no
    aggregation-order hazard; the mean word length quantizes through
    DECIMAL only in the REGISTRY oracle twin (raw double here).

    Zero-word documents fail rule 1 and use guarded denominators
    elsewhere (greatest(n,1)) so no NULL/NaN escapes.

    Staging note (r12): the word/line arrays and every integer signal are
    materialized as ATTRIBUTE columns before the ratios reference them —
    a non-attribute array referenced inside several lambdas is
    re-evaluated per reference (the stop-word test alone re-derived
    ``transform(words, lower)`` eight times, about half the operator's
    measured 10×-corpus cost), and ``array_intersect`` against the
    8-word literal computes the same distinct-hit count in one pass over
    a single lowered copy. Values are bit-identical: the integers are the
    same integers, and the ratios divide the same pairs."""
    t = F.coalesce(F.col(text_col), F.lit(""))  # size(split(NULL)) is NULL
    s0 = df.select(
        F.col(id_col),
        F.filter(F.split(t, r"\s+"), lambda x: x != "").alias("_gqw"),
        F.split(t, r"\n").alias("_gql"),
        (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).alias("_gqhash"),
        (
            F.size(F.split(t, r"\.\.\.")) - 1
            + (F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit(""))))
        ).alias("_gqell"),
    )
    words = F.col("_gqw")
    lines = F.col("_gql")
    s1 = s0.select(
        "*",
        F.size(words).alias("_gqnw"),
        F.coalesce(
            F.aggregate(words, F.lit(0), lambda acc, x: acc + F.length(x)), F.lit(0)
        ).alias("_gqswl"),
        F.size(lines).alias("_gqnl"),
        F.size(F.filter(lines, lambda l: F.ltrim(l).rlike(r"^[•\-\*]"))).alias(
            "_gqbullet"
        ),
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))).alias(
            "_gqellend"
        ),
        F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]"))).alias("_gqalpha"),
        F.size(
            F.array_intersect(
                F.array(*[F.lit(wd) for wd in GOPHER_REQUIRED_WORDS]),
                F.transform(words, F.lower),
            )
        ).alias("_gqstop"),
    )
    n_words = F.col("_gqnw")
    nw1 = F.greatest(n_words, F.lit(1))
    mean_wl = F.col("_gqswl").cast("double") / nw1.cast("double")
    symbol_ratio = (F.col("_gqhash") + F.col("_gqell")).cast("double") / nw1.cast(
        "double"
    )
    n_lines = F.greatest(F.col("_gqnl"), F.lit(1))
    frac_bullet = F.col("_gqbullet").cast("double") / n_lines.cast("double")
    frac_ell = F.col("_gqellend").cast("double") / n_lines.cast("double")
    frac_alpha = F.col("_gqalpha").cast("double") / nw1.cast("double")
    stop_hits = F.col("_gqstop")
    keep = (
        (n_words >= 50) & (n_words <= 100_000)
        & (mean_wl >= 3.0) & (mean_wl <= 10.0)
        & (symbol_ratio <= 0.1)
        & (frac_bullet < 0.9)
        & (frac_ell <= 0.3)
        & (frac_alpha >= 0.8)
        & (stop_hits >= 2)
    )
    return s1.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        frac_bullet.alias("frac_bullet_lines"),
        frac_ell.alias("frac_ellipsis_lines"),
        frac_alpha.alias("frac_alpha_words"),
        stop_hits.cast("bigint").alias("n_required_hits"),
        keep.cast("int").alias("keep"),
    )


def ccnet_lm(df: DataFrame, text_col: str) -> DataFrame:
    """Fit the CCNet corpus unigram LM: one corpus explode → token-keyed
    hash aggregate → ``(term, count)``. Vocabulary-sized (corpus-growth
    sublinear), so this is the sidecar table a production run writes to
    parquet ONCE and feeds back into :func:`ccnet_buckets` via ``lm=`` —
    the kmeans-centroid / DSIR-fit materialization pattern (VERDICT r10
    #2). The counts are exact integers, so a served fit scores
    bit-identically to the in-plan declarative fit."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def ccnet_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str | None = None,
    exact: bool = True,
    lm: DataFrame | None = None,
    materialize: bool = False,
) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    §4.3): score every document under the corpus unigram LM and split
    each language into terciles — 'head' is the third that looks most
    like fluent text (highest mean log-probability / lowest perplexity),
    'tail' the least; CCNet trains on head, samples middle, drops tail.

    Hash-exact discipline (the DSIR device): the per-TERM log-probability
    ``ln((c+1)/(T+V))`` rounds to DECIMAL(28,12) on the vocabulary
    dimension BEFORE any per-document summation, so the doc aggregate is
    exact decimal arithmetic (partial-agg order can't flip a value hash,
    libm last-ulp disagreements are absorbed by the rounding). The mean
    is ONE IEEE division of the exact decimal sum by the token count —
    bit-identical in any engine — and buckets depend only on the
    (mean DESC, id ASC) total order.

    ``exact=True``: NTILE(3) per language (deterministic, oracle-
    replicable; the window partitions on the language key, so only
    #languages reducers are hot). At 100 TB pass ``exact=False``: the
    two per-language cutoffs come from a mergeable approx-percentile
    sketch, broadcast back (2 rows per language), and the bucket test is
    a row-local comparison — no Window. Documents with zero tokens get
    bucket 0 / tier 'empty' (no transitions to score).

    Plan: one explode builds the token stream; the LM is a token-keyed
    hash aggregate; totals are a broadcast 1-row crossJoin (all in-plan,
    no driver collect); scoring joins the stream to the LM on the token
    key (AQE broadcasts small vocabularies) and re-aggregates by doc.

    Production one-scan paths (VERDICT r10 #2 — the declarative form
    re-derives the LM subtree under the totals crossJoin and a
    join-pushed isnotnull defeats ReuseExchange: measured EIGHT corpus
    scans in PLANS.md): pass ``lm=`` a precomputed ``(term, count)``
    frame from :func:`ccnet_lm` (fit once, write parquet, score many —
    the DSIR-fit sidecar pattern), or ``materialize=True`` to checkpoint
    the vocabulary-row fit eagerly inside this call. Either way the
    scoring stage reads the corpus twice (token stream + the id/lang
    base that restores zero-token docs) instead of eight times, and the
    LM values are the SAME exact integers, so buckets and hashes are
    unchanged (pinned in tests/test_quality.py)."""
    lang = F.col(lang_col) if lang_col else F.lit("all")
    toks = df.select(
        F.col(id_col).alias("_doc"),
        lang.alias("_lang"),
        F.explode(tokens(F.col(text_col))).alias("_term"),
    )
    _checkpoints: list[DataFrame] = []
    if lm is not None:
        lm = lm.select(F.col("term").alias("_term"), F.col("count").alias("_c"))
    else:
        lm = toks.groupBy("_term").agg(F.count(F.lit(1)).alias("_c"))
        if materialize:
            # eager checkpoint: the fit runs as its own job ONCE; every
            # downstream consumer (totals, the scoring join) reads the
            # stored vocabulary rows instead of re-deriving the explode.
            # The handle rides the result for curation.release_materialized
            # (checkpoint blocks outlive unpersist — SCALE.md rule 7)
            lm = lm.localCheckpoint(eager=True)
            _checkpoints.append(lm)
    totals = lm.agg(
        F.sum("_c").alias("_t"), F.count(F.lit(1)).alias("_v")
    )
    lp = F.round(
        F.log(
            (F.col("_c") + F.lit(1)).cast("double")
            / (F.col("_t") + F.col("_v")).cast("double")
        ),
        12,
    ).cast("decimal(28,12)")
    lm_scored = lm.crossJoin(F.broadcast(totals)).select(
        "_term", lp.alias("_lp")
    )
    per_doc = (
        toks.join(lm_scored, "_term")
        .groupBy("_doc", "_lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_lp").alias("_sum_lp"),
        )
        .withColumn(
            "mean_lp", F.col("_sum_lp").cast("double") / F.col("n_tokens")
        )
    )
    base = df.select(F.col(id_col).alias("_doc"), lang.alias("_lang"))
    scored = base.join(
        per_doc.select("_doc", "n_tokens", "mean_lp"), "_doc", "left"
    ).select(
        "_doc",
        "_lang",
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        "mean_lp",
    )
    # Union-free bucketing (r11): the old filter(>0) UNION filter(==0)
    # shape duplicated the whole `scored` subtree — Spark does not dedup
    # common subplans across union branches, so every corpus scan (and,
    # declaratively, the LM re-derivation) ran TWICE. Partitioning the
    # window on (lang, nonempty) instead gives empties their own
    # partition whose ntile is discarded by the when(): same membership,
    # same order, same buckets, half the scans.
    nonempty = F.col("n_tokens") > 0
    if exact:
        from pyspark.sql import Window

        wn = Window.partitionBy("_lang", nonempty).orderBy(
            F.desc("mean_lp"), F.asc("_doc")
        )
        bucketed = scored.withColumn(
            "bucket",
            F.when(nonempty, F.ntile(3).over(wn)).otherwise(F.lit(0)),
        )
    else:
        cuts = scored.filter(nonempty).groupBy("_lang").agg(
            F.percentile_approx("mean_lp", F.lit(2.0 / 3.0), F.lit(10000)).alias("_c1"),
            F.percentile_approx("mean_lp", F.lit(1.0 / 3.0), F.lit(10000)).alias("_c2"),
        )
        if materialize:
            # the cuts dimension is 2 values per language — checkpoint it
            # so the sketch pass doesn't re-derive the scoring subtree
            cuts = cuts.localCheckpoint(eager=True)
            _checkpoints.append(cuts)
        bucketed = scored.join(F.broadcast(cuts), "_lang", "left").withColumn(
            "bucket",
            F.when(~nonempty, F.lit(0))
            .when(F.col("mean_lp") >= F.col("_c1"), F.lit(1))
            .when(F.col("mean_lp") >= F.col("_c2"), F.lit(2))
            .otherwise(F.lit(3)),
        )
    tier = (
        F.when(F.col("bucket") == 1, F.lit("head"))
        .when(F.col("bucket") == 2, F.lit("middle"))
        .when(F.col("bucket") == 3, F.lit("tail"))
        .otherwise(F.lit("empty"))
    )
    out = bucketed.select(
        F.col("_doc").alias(id_col),
        F.col("_lang").alias("lang"),
        "n_tokens",
        "mean_lp",
        F.col("bucket").cast("int").alias("bucket"),
        tier.alias("tier"),
    )
    if _checkpoints:
        out._materialized_checkpoints = _checkpoints
    return out
