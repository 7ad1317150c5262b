"""Invariants for the sub-quadratic near-duplicate paths.

- Salted LSH bucket join (viral-shingle skew): the skew-salted self-join
  must emit EXACTLY the pair set of the plain self-join on an adversarial
  corpus where one signature covers half the docs, with every salted join
  cell bounded — the property the 100 TB path rests on.
- LSH-bucketed embedding near-dup: the bucketed pair set must be a SUBSET
  of the exact all-pairs result with identical cosine values, must equal
  the definitionally-derived same-bucket pairs (no pair lost to the
  sub-block decomposition), and must be invariant to the max_block split
  size (memory bounding must not change answers).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, seed, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pwc_challenge_dataengineer_spark.functions.dedup_fuzzy import (
    lsh_candidate_pairs,
)
from pwc_challenge_dataengineer_spark.functions.similarity import (
    cosine_near_dup_blocked,
    cosine_near_dup_lsh,
    hyperplane_signs,
    lsh_bucket,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _viral_signatures(spark, n_docs: int, viral_every: int):
    """(id, band, signature) where band 0's signature is 'VIRAL' for every
    ``viral_every``-th doc (≈50% when viral_every=2) — the adversarial
    bucket one boilerplate shingle produces — and unique-ish elsewhere."""
    rows = []
    for i in range(n_docs):
        for band in range(2):
            if band == 0 and i % viral_every == 0:
                sig = "VIRAL"
            else:
                # small collision groups so the cold path has real pairs too
                sig = f"b{band}s{i % 7}"
            rows.append((i, band, sig))
    return spark.createDataFrame(rows, ["doc_id", "band", "signature"])


@seed(20260813)
@settings(**_SETTINGS)
@given(
    n_docs=st.integers(min_value=4, max_value=40),
    viral_every=st.sampled_from([2, 3]),
    cap=st.integers(min_value=2, max_value=5),
)
def test_salted_lsh_pairs_equal_plain(spark, n_docs, viral_every, cap):
    sig = _viral_signatures(spark, n_docs, viral_every)
    plain = lsh_candidate_pairs(sig, "doc_id")
    salted = lsh_candidate_pairs(sig, "doc_id", bucket_cap=cap)
    as_set = lambda df: {(r["id_a"], r["id_b"]) for r in df.collect()}
    assert as_set(salted) == as_set(plain)


def test_salted_lsh_bounds_join_cells(spark):
    """With cap=3 and a 24-doc viral bucket, no salted join-cell key may
    hold more than ~cap rows per side (hash imbalance allowed a slack
    factor, straggler-task elimination is the contract)."""
    sig = _viral_signatures(spark, 48, 2)  # 24 docs share band-0 'VIRAL'
    cap = 3
    counts = sig.groupBy("band", "signature").agg(
        F.ceil(F.count("*") / F.lit(float(cap))).cast("int").alias("n_sub")
    )
    sized = sig.join(counts, ["band", "signature"]).select(
        "band",
        "signature",
        "n_sub",
        F.pmod(F.xxhash64(F.col("doc_id")), F.col("n_sub")).cast("int").alias("grp"),
    )
    per_cell = (
        sized.filter(F.col("n_sub") > 1)
        .groupBy("band", "signature", "grp")
        .agg(F.count("*").alias("rows_in_cell"))
        .agg(F.max("rows_in_cell").alias("mx"))
        .collect()[0]["mx"]
    )
    # 24 rows into ceil(24/3)=8 hash groups: mean 3; 4x slack for imbalance
    assert per_cell <= 4 * cap, per_cell
    # and the viral bucket really was split into more than one group
    n_groups = (
        sized.filter(F.col("signature") == "VIRAL")
        .select("grp")
        .distinct()
        .count()
    )
    assert n_groups > 1


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_lsh_near_dup_subset_of_exact_with_equal_values(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    exact = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in cosine_near_dup_blocked(
            emb, id_col="vec_id", vec_col="embedding", threshold=0.3, n_blocks=4
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in cosine_near_dup_lsh(
            emb, id_col="vec_id", vec_col="embedding", threshold=0.3
        ).collect()
    }
    assert set(lsh) <= set(exact), "LSH pairs must be a subset of exact pairs"
    for pair, cos in lsh.items():
        assert cos == exact[pair], (pair, cos, exact[pair])


def test_lsh_near_dup_equals_same_bucket_pairs(spark, sf_dir):
    """The bucketed GEMM must emit EVERY same-bucket pair above threshold —
    i.e. recall loss comes only from the bucketing definition, never from
    the sub-block decomposition losing candidates."""
    emb = _emb(spark, sf_dir)
    planes = hyperplane_signs(6, 64)
    with_bucket = emb.select(
        "vec_id", "embedding", lsh_bucket(F.col("embedding"), planes).alias("bucket")
    )
    buckets = {r["vec_id"]: r["bucket"] for r in with_bucket.collect()}
    exact = cosine_near_dup_blocked(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.3, n_blocks=4
    ).collect()
    expected = {
        (r["id_a"], r["id_b"])
        for r in exact
        if buckets[r["id_a"]] == buckets[r["id_b"]]
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_lsh(
            emb, id_col="vec_id", vec_col="embedding", threshold=0.3
        ).collect()
    }
    assert got == expected


def test_lsh_near_dup_invariant_to_max_block(spark, sf_dir):
    """Shrinking max_block (forcing multi-sub-block buckets and the
    cross-sub-block pair path) must not change the answer."""
    emb = _emb(spark, sf_dir)
    big = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in cosine_near_dup_lsh(
            emb, id_col="vec_id", vec_col="embedding", threshold=0.3, max_block=4096
        ).collect()
    }
    tiny = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in cosine_near_dup_lsh(
            emb, id_col="vec_id", vec_col="embedding", threshold=0.3, max_block=4
        ).collect()
    }
    assert big == tiny


def test_setjoin_prefix_positional_filter_lossless(spark, tmp_path):
    """Property check for the PPJoin prefix + positional + length filters:
    on a planted corpus with pairs straddling the threshold (including
    one at exactly J = t and shared-rare-shingle pairs the positional
    bound must NOT kill), the filtered join returns exactly the
    brute-force J >= t pair set."""
    import itertools

    from pwc_challenge_dataengineer_spark.plans.text_dedup import (
        setjoin_prefix_filter,
    )

    base = [f"w{i}" for i in range(12)]
    docs = {
        1: base,  # 10 shingles (k=3)
        2: base[:11] + ["xx"],  # near-identical to 1
        3: base[:6] + [f"y{i}" for i in range(6)],  # ~half overlap with 1
        4: [f"z{i}" for i in range(12)],  # disjoint
        5: base,  # exact duplicate of 1 (J = 1)
        6: base[:8] + [f"q{i}" for i in range(4)],
        7: [f"z{i}" for i in range(11)] + ["qq"],  # near-dup of 4
        8: ["a b", "lone"],  # tiny doc (prefix-size edge: n=1 shingle? no, 0)
        9: base[2:] + ["t0", "t1"],
    }
    rows = [
        (i, " ".join(toks), "en", "test", len(" ".join(toks)))
        for i, toks in docs.items()
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).write.parquet(sf + "/documents.parquet")

    def shingles(toks):
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    want = set()
    for a, b in itertools.combinations(sorted(docs), 2):
        sa, sb = shingles(docs[a]), shingles(docs[b])
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if round(j, 6) >= 0.5:
            want.add((a, b))
    got = {
        (r.id_a, r.id_b)
        for r in setjoin_prefix_filter(spark, sf).collect()
    }
    assert got == want
    assert want  # the plant actually exercises the >= t side
