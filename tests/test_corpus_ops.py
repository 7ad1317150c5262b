"""Invariant tests for the corpus-curation operators added in round 4:
unigram-LM scoring, duplicated-n-gram span detection, Efraimidis–Spirakis
weighted sampling, and HLL set algebra. The DuckDB oracle pins their values;
these tests pin the SEMANTIC properties the values must obey (span
disjointness, sampling bias direction, estimator identities) on inputs
constructed to exercise each property."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwc_challenge_dataengineer_spark.plans.catalog import QUERIES, _load_all

_load_all()


def test_dup_ngram_spans_invariants(spark, sf_dir):
    rows = QUERIES["dup_ngram_spans"](spark, sf_dir).collect()
    assert rows, "every document gets a row"
    for r in rows:
        # spans are disjoint maximal intervals: their token union never
        # exceeds the doc, each span holds >= 1 dup gram, and a covered
        # doc implies dup grams exist
        assert 0 <= r["covered_tokens"] <= r["n_toks"]
        assert r["n_spans"] <= r["n_dup_grams"]
        assert (r["covered_tokens"] > 0) == (r["n_dup_grams"] > 0)
        if r["n_spans"]:
            # a span of the base n-gram length covers exactly 4 tokens;
            # disjointness means covered >= 4 * n_spans is impossible to
            # violate downward and overlap would violate it upward
            assert r["covered_tokens"] >= 4 * r["n_spans"] - 0  # >= n per span
        assert abs(r["dup_coverage"] - round(r["covered_tokens"] / r["n_toks"], 6)) < 1e-9


def test_dup_ngram_spans_detects_planted_duplicate(spark, tmp_path):
    """Two docs sharing an 8-token run + one unrelated doc: the shared run
    (and only it) must be covered in both docs."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"{shared} seven eight nine ten eleven twelve"),
        (3, "completely different tokens with no repeats at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    df = df.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn("n_chars", F.length("text"))
    p = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    # the query loads <sf_dir>/documents.parquet
    out = {r["doc_id"]: r for r in QUERIES["dup_ngram_spans"](spark, str(tmp_path)).collect()}
    assert out[1]["covered_tokens"] == 8 and out[1]["n_spans"] == 1
    assert out[2]["covered_tokens"] == 8 and out[2]["n_spans"] == 1
    assert out[3]["covered_tokens"] == 0 and out[3]["n_spans"] == 0


def test_weighted_sample_bias_direction(spark, sf_dir):
    """A-ES with weight = n_chars: across many strata the selected docs'
    mean weight must exceed the population mean weight (heavier docs are
    more likely to win)."""
    sel = QUERIES["weighted_sample_per_source"](spark, sf_dir)
    sel_mean = sel.agg(F.avg("n_chars")).first()[0]
    from pwc_challenge_dataengineer_spark.schemas import load_table

    pop_mean = (
        load_table(spark, sf_dir, "documents").agg(F.avg("n_chars")).first()[0]
    )
    assert sel_mean > pop_mean
    # determinism: two runs agree exactly
    a = sorted(r["doc_id"] for r in sel.collect())
    b = sorted(
        r["doc_id"]
        for r in QUERIES["weighted_sample_per_source"](spark, sf_dir).collect()
    )
    assert a == b


def test_unigram_lm_rare_tokens_score_higher(spark, sf_dir):
    """Docs made of corpus-rare tokens must have higher avg_nll than docs
    made of corpus-frequent tokens — the property the quality filter uses."""
    scored = QUERIES["unigram_lm_score"](spark, sf_dir)
    assert scored.filter("avg_nll <= 0").count() == 0
    # perplexity is exp(avg_nll) (both rounded): spot-check consistency
    import math

    for r in scored.limit(20).collect():
        assert abs(r["unigram_ppl"] - round(math.exp(r["avg_nll"]), 2)) < 0.05


def test_hll_set_algebra_identities(spark, sf_dir):
    r = QUERIES["hll_set_algebra"](spark, sf_dir).first()
    # exact side is genuine set algebra
    assert (
        r["n_exact_union"]
        == r["n_exact_a"] + r["n_exact_b"] - r["n_exact_intersect"]
    )
    # inclusion-exclusion identity holds on the estimates by construction
    assert abs(r["hll_intersect"] - (r["hll_a"] + r["hll_b"] - r["hll_union"])) < 1e-3
    # union merge can never estimate below either input's estimate
    assert r["hll_union"] >= max(r["hll_a"], r["hll_b"]) - 1e-9
    # estimates land near exact at this cardinality (HLL p=8: ~6.5% rse;
    # allow 4 sigma)
    for est, exact in (
        (r["hll_a"], r["n_exact_a"]),
        (r["hll_b"], r["n_exact_b"]),
        (r["hll_union"], r["n_exact_union"]),
    ):
        assert abs(est - exact) <= max(5.0, 0.3 * exact)


def test_containment_detects_planted_subset(spark, tmp_path):
    """Doc 1's full text embedded inside doc 2 → containment 1.0 of 1 in 2,
    regardless of how much extra text doc 2 carries."""
    inner = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, inner),
        (2, f"pre1 pre2 pre3 {inner} post1 post2 post3 post4 post5"),
        (3, "unrelated words that share nothing with the others at all ok"),
    ]
    df = (
        spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn("n_chars", F.length("text"))
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["containment_pairs"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["contained_id"] == 1 and r["container_id"] == 2
    assert r["containment"] == 1.0


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    split = QUERIES["leakage_safe_split"](spark, sf_dir)
    # every doc assigned exactly once
    from pwc_challenge_dataengineer_spark.schemas import load_table

    assert split.count() == load_table(spark, sf_dir, "documents").count()
    # a cluster never straddles a split boundary — the leakage property
    straddling = (
        split.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert straddling == 0
    assert {r["split"] for r in split.select("split").distinct().collect()} <= {
        "train",
        "val",
        "test",
    }


def test_corpus_rebalance_rates_plan_is_consistent(spark, sf_dir):
    plan = QUERIES["corpus_rebalance_rates"](spark, sf_dir).collect()
    assert plan
    total = sum(r["n_docs"] for r in plan)
    target = total / len(plan)
    for r in plan:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert 0 < r["gate"] <= 10000
        # under-represented sources keep everything
        if r["n_docs"] <= target:
            assert r["gate"] == 10000 and r["n_kept"] == r["n_docs"]
        # hash gate realizes its rate within coarse binomial tolerance
        assert abs(r["realized_rate"] - r["gate"] / 10000.0) < 0.25


def test_hybrid_search_rrf_ranking(spark, sf_dir):
    rows = QUERIES["hybrid_search_rrf"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert sorted(r["rrf_rank"] for r in rows) == list(range(1, 11))
    by_rank = sorted(rows, key=lambda r: r["rrf_rank"])
    scores = [r["rrf_score"] for r in by_rank]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0 <= r["rank_lex"] <= 20 and 0 <= r["rank_sem"] <= 20
        # a fused doc must appear in at least one arm
        assert r["rank_lex"] > 0 or r["rank_sem"] > 0


def test_sliding_hll_tracks_exact(spark, sf_dir):
    rows = QUERIES["sliding_distinct_users_hll"](spark, sf_dir).collect()
    assert rows
    from pwc_challenge_dataengineer_spark.schemas import load_table

    n_hours = (
        load_table(spark, sf_dir, "events")
        .select(F.date_trunc("hour", "ts"))
        .distinct()
        .count()
    )
    assert len(rows) == n_hours
    # p=8 HLL: ~6.5% rse; allow a generous envelope at small counts
    for r in rows:
        assert abs(r["hll_estimate"] - r["n_exact"]) <= max(
            6.0, 0.3 * r["n_exact"]
        )


def test_bpe_learn_merges_on_planted_corpus(spark, tmp_path):
    """Corpus dominated by the word 'ab': round 1 must merge ('a','b')
    (tiebreak vs ('b','</w>') on symbol order), round 2 ('ab','</w>')."""
    rows = [(1, "ab ab ab"), (2, "ab cd")]
    df = (
        spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn("n_chars", F.length("text"))
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["iteration"]: r for r in QUERIES["bpe_learn_merges"](spark, str(tmp_path)).collect()}
    assert (out[1]["sym_a"], out[1]["sym_b"], out[1]["pair_count"]) == ("a", "b", 4)
    assert (out[2]["sym_a"], out[2]["sym_b"], out[2]["pair_count"]) == ("ab", "</w>", 4)


def test_bpe_merge_counts_non_increasing(spark, sf_dir):
    """BPE invariant: a later round's best pair can never beat an earlier
    round's (new pairs created by a merge are bounded by that merge's
    count)."""
    rows = sorted(
        QUERIES["bpe_learn_merges"](spark, sf_dir).collect(),
        key=lambda r: r["iteration"],
    )
    assert len(rows) == 4
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r["merged"] == r["sym_a"] + r["sym_b"]


def test_revenue_trend_forecast_consistency(spark, sf_dir):
    import math

    rows = QUERIES["revenue_trend_forecast"](spark, sf_dir).collect()
    assert len(rows) == 25  # one per nation
    for r in rows:
        assert r["n"] > 2
        for v in (r["slope"], r["intercept"], r["forecast_next_day"]):
            assert math.isfinite(v)


def test_source_mix_diagnostics_invariants(spark, sf_dir):
    rows = QUERIES["source_mix_diagnostics"](spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["alpha_weight"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        # KL is non-negative; alpha smoothing compresses toward uniform:
        # small sources get alpha_weight above their raw share, large ones
        # below
        assert r["kl_to_corpus"] >= 0
    mean_share = 1.0 / len(rows)
    for r in rows:
        if r["token_share"] < mean_share:
            assert r["alpha_weight"] >= r["token_share"]
        elif r["token_share"] > mean_share:
            assert r["alpha_weight"] <= r["token_share"]


def test_span_excision_consistent_with_span_report(spark, sf_dir):
    """The transform and the report must agree doc-by-doc: tokens removed
    by excision == tokens covered by the reported spans."""
    report = {
        r["doc_id"]: r["covered_tokens"]
        for r in QUERIES["dup_ngram_spans"](spark, sf_dir).collect()
    }
    excised = QUERIES["dedup_span_excision"](spark, sf_dir).collect()
    assert len(excised) == len(report)
    for r in excised:
        assert r["removed_toks"] == report[r["doc_id"]]
        assert r["kept_toks"] + r["removed_toks"] == r["n_toks"]


def test_span_excision_planted(spark, tmp_path):
    import hashlib

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"{shared} seven eight nine ten eleven twelve"),
    ]
    df = (
        spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn("n_chars", F.length("text"))
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in QUERIES["dedup_span_excision"](spark, str(tmp_path)).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[1]["removed_toks"] == 8
    assert out[1]["cleaned_md5"] == md5("one two three four five six")
    assert out[2]["cleaned_md5"] == md5("seven eight nine ten eleven twelve")


def test_pq_adc_approximates_exact_ranking(spark, sf_dir):
    """PQ/ADC invariants: approx distances are non-negative, ranks are a
    permutation 1..10 ordered by approx distance, and the ADC top-10 must
    overlap substantially with the exact top-10 (quantization preserves
    coarse geometry)."""
    rows = QUERIES["pq_adc_topk"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert sorted(r["rank"] for r in rows) == list(range(1, 11))
    by_rank = sorted(rows, key=lambda r: r["rank"])
    approx = [r["approx_d2"] for r in by_rank]
    assert approx == sorted(approx)
    assert all(r["approx_d2"] >= 0 and r["exact_d2"] >= 0 for r in rows)
    # exact top-10 for the same query
    from pwc_challenge_dataengineer_spark.functions.similarity import (
        as_double_array,
        sq_l2,
    )
    from pwc_challenge_dataengineer_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("e")
    )
    q = emb.filter("vec_id = 0").select(F.col("e").alias("qe"))
    exact_top = (
        emb.filter("vec_id <> 0")
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(sq_l2(F.col("e"), F.col("qe")), 6).alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(10)
        .collect()
    )
    overlap = {r["vec_id"] for r in exact_top} & {r["neighbor_id"] for r in rows}
    assert len(overlap) >= 3


def test_bigram_lm_vs_unigram(spark, sf_dir):
    """Interpolated bigram LM covers exactly the docs the unigram model
    scores, every NLL is positive, and perplexity is exp(avg_nll)."""
    bi = {r["doc_id"]: r for r in QUERIES["bigram_lm_score"](spark, sf_dir).collect()}
    uni = {r["doc_id"]: r for r in QUERIES["unigram_lm_score"](spark, sf_dir).collect()}
    assert set(bi) == set(uni)
    assert all(r["avg_nll"] > 0 for r in bi.values())
    import math

    for r in list(bi.values())[:20]:
        assert abs(r["bigram_ppl"] - round(math.exp(r["avg_nll"]), 2)) < 0.05


def test_mmr_diversifies(spark, sf_dir):
    """MMR invariants: 5 distinct picks, rank 1 is the raw-relevance argmax
    with mmr == relevance, and every later score is lambda*rel - (1-lambda)*
    pen with pen a cosine in [-1, 1]."""
    rows = sorted(
        QUERIES["mmr_diverse_topk"](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    ids = [r["neighbor_id"] for r in rows]
    assert len(set(ids)) == 5
    assert rows[0]["mmr_score"] == rows[0]["relevance"]
    for r in rows[1:]:
        # pen = max cosine to the already-selected set, a value in [-1, 1]
        assert 0.7 * r["relevance"] - 0.3 - 1e-9 <= r["mmr_score"] <= 0.7 * r["relevance"] + 0.3 + 1e-9


def test_coverage_greedy_picks_planted_superset(spark, tmp_path):
    """A planted corpus where one doc's shingles strictly contain every
    other doc's: greedy must pick it first, and the second pick must be
    the doc adding the most NOT-yet-covered shingles (not the globally
    largest remaining doc)."""
    import pwc_challenge_dataengineer_spark.plans.sampling as S

    big = "a b c d e f g h i j k l"          # superset doc: 10 shingles
    sub = "a b c d e f"                       # subset of big: adds 0
    fresh = "x y z w v"                       # disjoint: adds 3
    docs = spark.createDataFrame(
        [(1, big), (2, sub), (3, fresh)], "doc_id long, text string"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    for t in "region nation customer supplier part orders lineitem events embeddings".split():
        spark.createDataFrame([(1,)], "x long").write.mode("overwrite").parquet(
            str(tmp_path / f"{t}.parquet")
        )
    out = S.coverage_greedy_docs(spark, str(tmp_path)).collect()
    by_rank = {r.pick_rank: r for r in out}
    assert by_rank[1].doc_id == 1 and by_rank[1].gain == 10
    assert by_rank[2].doc_id == 3 and by_rank[2].gain == 3
    # doc 2 adds nothing new -> its residual gain is 0, so it is picked
    # (if at all) only after every positive-gain doc, with gain 0 absent
    # from the remaining set entirely (anti-joined away)
    assert all(r.doc_id != 2 for r in out)
    assert by_rank[2].covered_total == 13


def test_bfs_hops_on_planted_graph(spark, tmp_path):
    """Planted two-hop chain: supplier s1 (nation 0) supplies part p1;
    supplier s2 (nation 1) also supplies p1 and additionally p2. BFS from
    nation-0 suppliers must reach p1 at hop 1, s2 at hop 2, p2 at hop 3."""
    from pwc_challenge_dataengineer_spark.plans.graph import bfs_hops_bipartite

    lineitem = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 2)], "l_suppkey long, l_partkey long"
    )
    supplier = spark.createDataFrame(
        [(1, 0), (2, 1)], "s_suppkey long, s_nationkey long"
    )
    lineitem.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    supplier.write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    out = {r.node: r.hops for r in bfs_hops_bipartite(spark, str(tmp_path)).collect()}
    assert out == {"s1": 0, "p1": 1, "s2": 2, "p2": 3}


def test_weighted_shortest_path_prefers_cheap_detour(spark, tmp_path):
    """Planted weights where the 3-hop detour is cheaper than the direct
    edge: s1-p1 costs 100 direct, but s1-p2 (1) + p2-s2 (1) + s2-p1 (1)
    totals 3 — bounded Bellman-Ford (4 rounds) must return 3.00 for p1."""
    from decimal import Decimal

    from pwc_challenge_dataengineer_spark.plans.graph import (
        weighted_shortest_path,
    )

    rows = [
        (1, 1, Decimal("100.00")),  # s1-p1 expensive direct edge
        (1, 2, Decimal("1.00")),    # s1-p2 cheap
        (2, 2, Decimal("1.00")),    # s2-p2 cheap
        (2, 1, Decimal("1.00")),    # s2-p1 cheap
    ]
    lineitem = spark.createDataFrame(
        rows, "l_suppkey long, l_partkey long, l_extendedprice decimal(12,2)"
    )
    supplier = spark.createDataFrame(
        [(1, 0), (2, 1)], "s_suppkey long, s_nationkey long"
    )
    lineitem.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    supplier.write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    out = {
        r.node: float(r.dist)
        for r in weighted_shortest_path(spark, str(tmp_path)).collect()
    }
    assert out == {"s1": 0.0, "p2": 1.0, "s2": 2.0, "p1": 3.0}


def test_gopher_flags_planted_repetition(spark, tmp_path):
    """A doc that is one 2-gram repeated must flag top2gram_repetition;
    a doc of all-distinct words must keep."""
    import pwc_challenge_dataengineer_spark.plans.training_prep as TP

    docs = spark.createDataFrame(
        [
            (1, "spam ham " * 30),          # one dominant 2-gram
            (2, "a b c d e f g h i j k l"), # no repetition
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in TP.gopher_repetition_signals(spark, str(tmp_path)).collect()
    }
    assert out[1].verdict in ("top2gram_repetition", "dup5gram_repetition")
    assert out[1].top2gram_char_frac > 0.5
    assert out[2].verdict == "keep"


def test_price_volume_mix_reconciles(spark, sf_dir):
    """For continuing brands the three effects must reconcile to the
    revenue delta up to float residual."""
    from pwc_challenge_dataengineer_spark.plans.datamart import price_volume_mix

    rows = price_volume_mix(spark, sf_dir).collect()
    assert rows, "PVM returned no brands"
    for r in rows:
        if r.status == "continuing":
            resid = abs(
                r.delta - (r.volume_effect + r.price_effect + r.cross_effect)
            )
            assert resid < 1e-6 * max(1.0, abs(r.delta)), (r.brand, resid)


def test_uni_estep_matches_reference_viterbi(spark):
    """Pin for the r13 enumeration rewrite of the unigram-trainer E-step:
    the one-shuffle full-enumeration _uni_estep must reproduce a pure-Python
    Viterbi with the EXACT production semantics — Laplace probs, left-to-
    right float products, (score DESC, path ASC) winner tie-break — on an
    adversarial vocab where words segment many ways (every substring piece
    present, forced score ties between '1+1-char' and '2-char' routes).
    Covers the done-row carry bug class too: words of different lengths
    finish on different enumeration steps and must all survive to the end
    (sequence(1, 0) is DESCENDING in Spark, not empty)."""
    from pwc_challenge_dataengineer_spark.plans.training_prep import (
        _UNI_MAXPIECE,
        _uni_estep,
    )

    words_rows = [
        ("abab", 7),       # many segmentations: a|b|a|b, ab|ab, ab|a|b, ...
        ("abcabc", 3),     # longer, multi-piece routes
        ("aa", 11),        # finishes on step 1-2 (done-row carry)
        ("zzzzzzzzzz", 2), # 10 chars, single-char-only route
        ("ba", 5),
    ]
    vocab_rows = [
        ("a", 10), ("b", 10), ("c", 4), ("z", 1),
        ("ab", 6), ("ba", 6), ("bc", 2), ("abc", 3), ("abab", 1), ("aa", 10),
    ]
    words = spark.createDataFrame(words_rows, "tok string, wcount long")
    vocab = spark.createDataFrame(vocab_rows, "piece string, cnt long")

    # reference: exhaustive enumeration with identical FP products/tie-break
    tot = sum(c for _, c in vocab_rows)
    nv = len(vocab_rows)
    prob = {p: (c + 1) / (tot + nv) for p, c in vocab_rows}

    def segmentations(tok):
        if not tok:
            yield []
            return
        for l in range(1, min(_UNI_MAXPIECE, len(tok)) + 1):
            piece = tok[:l]
            if piece in prob:
                for rest in segmentations(tok[l:]):
                    yield [piece] + rest

    expected: dict[str, int] = {}
    for tok, wcount in words_rows:
        best = None
        for seg in segmentations(tok):
            score = 1.0
            for p in seg:
                score = score * prob[p]  # left-to-right, same FP order
            path = "".join(p + " " for p in seg)
            key = (-score, path)
            if best is None or key < best:
                best = key
        assert best is not None, tok
        for p in best[1].split():
            expected[p] = expected.get(p, 0) + wcount

    got = {r["piece"]: r["cnt"] for r in _uni_estep(words, vocab).collect()}
    assert got == expected
