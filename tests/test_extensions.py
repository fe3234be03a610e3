"""Semantic tests for the LLM-pipeline extension operators: approximate
methods must agree with their exact counterparts on the test corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_minhash_lsh_matches_exact(spark, docs):
    """Verified MinHash-LSH output ⊆ exact n-gram Jaccard output, with
    high recall (the banded-bucket candidate stage may only lose pairs,
    never invent them, because candidates are re-verified exactly)."""
    from pgdedupe_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {
        (r.id1, r.id2) for r in ngram_jaccard_pairs(docs, "doc_id", "text", 5, 0.6).collect()
    }
    approx = {
        (r.id1, r.id2)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", 5, num_hashes=64, bands=16, threshold=0.6
        ).collect()
    }
    assert approx <= exact, f"false positives: {approx - exact}"
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.9, f"LSH recall {recall:.2f} over {len(exact)} true pairs"


def test_simhash_finds_near_dups(spark, docs):
    """Docs with ~identical token multisets must collide at low Hamming
    distance; output must be symmetric-free (id1 < id2) and deterministic."""
    from pgdedupe_spark.operators.dedup import simhash_pairs

    p1 = simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    p2 = simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    assert sorted(map(tuple, p1)) == sorted(map(tuple, p2))
    for r in p1:
        assert r.id1 < r.id2
        assert 0 <= r.hamming <= 3


def test_ann_lsh_subset_of_exact_topk(spark, sf_dir):
    """Bucketed ANN ranks a subset of true neighbors; every (query,
    neighbor) it returns must appear in the exact brute-force top-20."""
    from pgdedupe_spark.operators.similarity import cosine_topk, lsh_cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = cosine_topk(emb, "vec_id", "embedding", k=20)
    approx = lsh_cosine_topk(emb, "vec_id", "embedding", k=5)
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    for r in approx.collect():
        # LSH may retrieve deeper-than-20 neighbors only if buckets are tiny;
        # just require sane ranks and self-exclusion here, overlap below
        assert r.query_id != r.neighbor_id
        assert 1 <= r.rank <= 5
    overlap = sum(
        (r.query_id, r.neighbor_id) in exact_pairs for r in approx.collect()
    )
    assert overlap >= 1


def test_multimodal_decode_plumbing(spark, docs):
    """mapInPandas decode stage: schema, batch shape, determinism; strict
    mode raises (documents the stubbed decoder)."""
    from pgdedupe_spark.operators.multimodal import (
        FEATURE_DIM,
        attach_binary_payload,
        decode_features,
    )

    media = attach_binary_payload(docs.limit(20), "doc_id", "text")
    out = decode_features(media, mode="fake")
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.modality == "image"
        assert len(r.features) == FEATURE_DIM
        assert r.n_bytes > 0
    # determinism
    rows2 = decode_features(media, mode="fake").collect()
    assert sorted(map(tuple, ((r.media_id, tuple(r.features)) for r in rows))) == sorted(
        map(tuple, ((r.media_id, tuple(r.features)) for r in rows2))
    )

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError  # noqa: F401

    with _pytest.raises(Exception, match="strict decode|NotImplementedError|media decode"):
        decode_features(media, mode="strict").collect()


def test_exact_dup_groups_empty_on_distinct_corpus(spark, docs):
    from pgdedupe_spark.operators.dedup import exact_duplicate_groups

    groups = exact_duplicate_groups(docs, "text", "doc_id")
    dup_union = docs.select("text").distinct().count()
    assert groups.count() == docs.count() - dup_union


def test_ivf_full_probe_equals_brute_force(spark, docs):
    """n_probe == n_centroids degrades IVF to exhaustive search — results
    must equal the exact brute-force top-k (same ranks, same neighbors)."""
    from pgdedupe_spark.operators.similarity import cosine_topk, ivf_cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(emb, "vec_id", "embedding", k=5).collect()
    }
    full_probe = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_cosine_topk(
            emb, "vec_id", "embedding", k=5, n_centroids=8, n_probe=8
        ).collect()
    }
    assert full_probe == exact


def test_ivf_partial_probe_recall(spark, docs):
    """Probing half the cells must still recover most true neighbors
    (recall@5 well above random) and be deterministic."""
    from pgdedupe_spark.operators.similarity import cosine_topk, ivf_cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        r.query_id: set()
        for r in cosine_topk(emb, "vec_id", "embedding", k=5).collect()
    }
    for r in cosine_topk(emb, "vec_id", "embedding", k=5).collect():
        exact[r.query_id].add(r.neighbor_id)
    approx = {q: set() for q in exact}
    rows = ivf_cosine_topk(emb, "vec_id", "embedding", k=5, n_centroids=8, n_probe=4).collect()
    for r in rows:
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    recall = sum(len(exact[q] & approx.get(q, set())) for q in exact) / sum(
        len(v) for v in exact.values()
    )
    assert recall >= 0.5, f"IVF recall@5 too low: {recall:.2f}"
    rows2 = ivf_cosine_topk(emb, "vec_id", "embedding", k=5, n_centroids=8, n_probe=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_ivf_lloyd_refinement(spark, docs):
    """Lloyd refinement moves centroids but cannot break exactness under
    full probing, and partial-probe recall stays useful."""
    from pgdedupe_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
        ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    _, seeded = ivf_index(emb, "vec_id", "embedding", n_centroids=8, refine_iters=0)
    _, refined = ivf_index(emb, "vec_id", "embedding", n_centroids=8, refine_iters=2)
    assert len(refined) == len(seeded) == 8
    assert any(
        s_vec != r_vec for (_, s_vec), (_, r_vec) in zip(seeded, refined)
    ), "two Lloyd iterations should move at least one centroid"

    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(emb, "vec_id", "embedding", k=5).collect()
    }
    full_probe = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_cosine_topk(
            emb, "vec_id", "embedding", k=5, n_centroids=8, n_probe=8, refine_iters=2
        ).collect()
    }
    assert full_probe == exact

    got = {}
    for r in ivf_cosine_topk(
        emb, "vec_id", "embedding", k=5, n_centroids=8, n_probe=4, refine_iters=2
    ).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    want = {}
    for r in cosine_topk(emb, "vec_id", "embedding", k=5).collect():
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    recall = sum(len(want[q] & got.get(q, set())) for q in want) / sum(
        len(v) for v in want.values()
    )
    assert recall >= 0.5, f"refined IVF recall@5 too low: {recall:.2f}"


def test_unigram_logprob_quality_signal(spark):
    """Prose made of common tokens must outscore token soup, and the
    numbers must match an exact replica computed in python from the same
    tokenization (add-one smoothed corpus unigram LM)."""
    import math

    from pgdedupe_spark.operators.text import unigram_logprob

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "zqx jvk wpf qqq zzz xxy"),   # garbled: every token rare
        (4, "the the the the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.mean_logprob) for r in
           unigram_logprob(df, "doc_id", "text").collect()}

    # exact replica
    import re
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in rows}
    from collections import Counter
    c = Counter(x for ts in toks.values() for x in ts)
    t_plus_v = sum(c.values()) + len(c)
    for d, ts in toks.items():
        want = sum(math.log((c[x] + 1) / t_plus_v) for x in ts) / len(ts)
        n, mlp = got[d]
        assert n == len(ts)
        assert abs(mlp - want) < 1e-12, (d, mlp, want)

    assert got[4][1] > got[1][1] > got[3][1]  # common > prose > garbage


def test_bigram_logprob_exact_and_ccnet_pattern(spark):
    """Bigram LM: (a) self-scored numbers match an exact python replica
    of add-one-smoothed transition probabilities over the same
    tokenization; (b) the CCNet deployment shape — LM trained on clean
    prose, scoring a held-out corpus — ranks prose above repetitive
    degeneration that a unigram gate cannot see; (c) short docs emit
    n_bigrams=0 / NULL score."""
    import math
    import re
    from collections import Counter

    from pgdedupe_spark.operators.text import bigram_logprob

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "mat the on sat cat the"),  # same unigrams as #1, scrambled
        (4, "one"),                     # <2 tokens → no transitions
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.mean_logprob) for r in
           bigram_logprob(df, "doc_id", "text").collect()}

    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in rows}
    bigr = {d: list(zip(ts, ts[1:])) for d, ts in toks.items()}
    cb = Counter(b for bs in bigr.values() for b in bs)
    cw = Counter(b[0] for bs in bigr.values() for b in bs)
    v = len({x for ts in toks.values() for x in ts})
    for d, bs in bigr.items():
        n, mlp = got[d]
        assert n == len(bs)
        if not bs:
            assert mlp is None
            continue
        want = sum(math.log((cb[b] + 1) / (cw[b[0]] + v)) for b in bs) / len(bs)
        assert abs(mlp - want) < 1e-12, (d, mlp, want)

    # scrambled doc shares doc 1's unigrams but not its transitions —
    # bigram score separates them while a unigram score cannot
    assert got[1][1] > got[3][1]

    # CCNet shape: train on clean, score held-out candidates
    clean = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog sat on the rug") for i in range(5)],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(100, "the cat sat on the rug"), (101, "mat mat mat mat mat mat")],
        "doc_id long, text string",
    )
    scored = {r.doc_id: r.mean_logprob for r in
              bigram_logprob(cand, "doc_id", "text", train_df=clean).collect()}
    assert scored[100] > scored[101]


def test_script_profile_multilingual_fixture(spark):
    """script_profile on real multilingual text (the driver corpus is
    ASCII, so the semantics live here): per-family counts, dominance
    with the fixed tie order, and the all-punctuation 'none' case."""
    from pgdedupe_spark.operators.text import script_profile

    df = spark.createDataFrame(
        [
            (0, "hello world 123"),
            (1, "привет мир"),
            (2, "你好世界 こんにちは 한국"),
            (3, "مرحبا بالعالم"),
            (4, "!!! ... ???"),
            (5, "abc абв"),       # 3 vs 3: tie -> latin (fixed priority)
            (6, "αβγδ mixed"),    # greek 4 < latin 5
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in script_profile(df, "doc_id", "text").collect()}
    assert (out[0].n_latin, out[0].n_digit, out[0].dominant_script) == (10, 3, "latin")
    assert out[1].n_cyrillic == 9 and out[1].dominant_script == "cyrillic"
    assert out[2].n_cjk == 11 and out[2].dominant_script == "cjk"
    assert out[3].n_arabic == 12 and out[3].dominant_script == "arabic"
    assert out[4].dominant_script == "none"
    assert out[5].n_latin == 3 and out[5].n_cyrillic == 3
    assert out[5].dominant_script == "latin"
    assert out[6].n_greek == 4 and out[6].dominant_script == "latin"


def test_script_profile_null_text_is_none(spark):
    """NULL text profiles as all-zero counts + 'none' — and the DuckDB
    oracle coalesces identically, so the hash row can't diverge the day
    the corpus gains a null (review finding r7)."""
    from pgdedupe_spark.operators.text import script_profile

    df = spark.createDataFrame([(0, None), (1, "abc")], "doc_id long, text string")
    out = {r.doc_id: r for r in script_profile(df, "doc_id", "text").collect()}
    assert out[0].dominant_script == "none"
    assert all(
        getattr(out[0], f"n_{s}") == 0
        for s in ("latin", "cyrillic", "greek", "arabic", "cjk", "digit")
    )
    assert out[1].dominant_script == "latin"


def test_url_parse_matrix(spark):
    """Fixture URLs cover scheme/host/port/path/domain extraction:
    userinfo stripped, query+fragment excluded from path, multi-part
    public suffixes recognized, malformed rows NULL out."""
    from pgdedupe_spark.operators.text import url_parse

    cases = [
        ("https://www.example.com/a/b?q=1#frag", "https", "www.example.com",
         None, "/a/b", "example.com"),
        ("http://blog.sample.co.uk:8080/x", "http", "blog.sample.co.uk",
         8080, "/x", "sample.co.uk"),
        ("https://user:pw@files.archive.org.uk:444/d", "https",
         "files.archive.org.uk", 444, "/d", "archive.org.uk"),
        ("ftp://mirror.data.ne.jp", "ftp", "mirror.data.ne.jp",
         None, "", "data.ne.jp"),
        ("https://localhost/x", "https", "localhost", None, "/x", None),
        ("no scheme here", None, None, None, None, None),
        # ADVICE r7: scheme/host are case-insensitive (RFC 3986) and
        # canonically lowercased; path keeps its original case
        ("HTTPS://WWW.Example.COM/CaseSensitive/Path", "https",
         "www.example.com", None, "/CaseSensitive/Path", "example.com"),
        ("HtTp://Blog.Sample.CO.UK:8080/X", "http", "blog.sample.co.uk",
         8080, "/X", "sample.co.uk"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, *_) in enumerate(cases)],
                               "i long, url string")
    got = {r["i"]: r for r in url_parse(df, "url").collect()}
    for i, (_, sch, host, port, path, dom) in enumerate(cases):
        r = got[i]
        assert r["url_scheme"] == sch, (i, r)
        assert r["url_host"] == host, (i, r)
        assert r["url_port"] == port, (i, r)
        assert r["url_path"] == path, (i, r)
        assert r["url_domain"] == dom, (i, r)


def test_url_parse_refuses_clash_and_stays_jvm(spark):
    import pytest

    from pgdedupe_spark.operators.text import url_parse

    df = spark.createDataFrame([(1, "x", "y")], "i long, url string, url_host string")
    with pytest.raises(ValueError, match="url_host"):
        url_parse(df, "url")

    clean = spark.createDataFrame([(1, "https://a.b.c/d")], "i long, url string")
    plan = url_parse(clean, "url")._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan
    assert "Exchange" not in plan  # pure projection, zero shuffle


def test_html_to_text_extraction_matrix(spark):
    """html_to_text strips comments (even ones wrapping script tags),
    script/style/noscript WITH content, all remaining tags; decodes the
    common entities with &amp; last; collapses whitespace. Encoded
    markup (&lt;b&gt;) survives as text because decode runs AFTER the
    tag strip."""
    from pgdedupe_spark.operators.text import html_to_text

    cases = [
        ("<p>Hello <b>world</b></p>", "Hello world"),
        ("<!-- <script>x</script> --><p>kept</p>", "kept"),
        ("<SCRIPT a=1>var x = '<p>';</SCRIPT>after", "after"),
        ("<style>p { color: red }</style>text", "text"),
        ("a&nbsp;b &amp; c &lt;i&gt; &#39;q&#39;", "a b & c <i> 'q'"),
        ("&amp;lt;", "&lt;"),  # escaped entity must NOT double-decode
        ("  <div>\n\tspaced   out\n</div> ", "spaced out"),
        ("plain text, no markup", "plain text, no markup"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, h string"
    )
    got = {r["i"]: r["text_extracted"] for r in html_to_text(df, "h").collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_html_to_text_zero_shuffle_plan(spark):
    from pgdedupe_spark.operators.text import html_to_text

    df = spark.createDataFrame([(1, "<p>x</p>")], "i long, h string")
    plan = html_to_text(df, "h")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan


def test_quality_model_fit_separates_and_scores_jvm_side(spark):
    """Model-based quality filtering (r9): fit_quality_classifier on
    planted good (English-like, stopword-rich) vs bad (digit/punct spam)
    corpora must separate a holdout cleanly, and quality_model_scores
    must score corpus rows as a pure codegen projection (no Python, no
    joins)."""
    from pgdedupe_spark.operators.text import (
        fit_quality_classifier,
        quality_model_scores,
    )

    good_rows = [
        (i, f"the quality of the text is that it is written for a reader and "
            f"it has the structure of a sentence number {i}")
        for i in range(40)
    ]
    bad_rows = [
        (1000 + i, ("x9$#@ " * 3 + f"{i * 7919} 00 11 22 33 !!! ### $$$ ") * 2)
        for i in range(40)
    ]
    good = spark.createDataFrame(good_rows, "doc_id long, text string")
    bad = spark.createDataFrame(bad_rows, "doc_id long, text string")
    clf = fit_quality_classifier(good, bad, "text", sample=30)

    # holdout rows the fit never saw (sample=30 of 40 per side)
    scored = quality_model_scores(
        good.unionByName(bad), "doc_id", "text", clf
    ).collect()
    by_id = {r.doc_id: r.quality_score for r in scored}
    good_ok = sum(1 for i, _ in good_rows if by_id[i] > 0.5)
    bad_ok = sum(1 for i, _ in bad_rows if by_id[i] < 0.5)
    assert good_ok >= 38, f"good docs misclassified: {40 - good_ok}"
    assert bad_ok >= 38, f"bad docs misclassified: {40 - bad_ok}"

    # threshold deployment keeps only the good side
    kept = quality_model_scores(
        good.unionByName(bad), "doc_id", "text", clf, threshold=0.5
    )
    ids = {r.doc_id for r in kept.collect()}
    assert len(ids & {r[0] for r in good_rows}) >= 38
    assert len(ids & {r[0] for r in bad_rows}) <= 2

    # hot path: projection only — no Python eval, no join, no exchange
    plan = kept._jdf.queryExecution().executedPlan().toString()
    for bad_node in ("BatchEvalPython", "ArrowEvalPython", "Join", "Exchange"):
        assert bad_node not in plan, f"{bad_node} in scoring plan"


def test_quality_model_fit_requires_both_sides(spark):
    import pytest as _pytest

    from pgdedupe_spark.operators.text import fit_quality_classifier

    docs = spark.createDataFrame([(1, "some text")], "doc_id long, text string")
    empty = docs.filter("doc_id < 0")
    with _pytest.raises(ValueError, match="non-empty"):
        fit_quality_classifier(docs, empty, "text")
