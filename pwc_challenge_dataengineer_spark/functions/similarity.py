"""Similarity search over embedding columns (array<float>).

BASELINE.json north-star operator set. Two paths:

- brute-force cosine top-k: cross join queries × corpus, dot product via
  ``zip_with`` + ``aggregate`` (sequential left fold → deterministic double
  accumulation, JVM-side, no UDF). Fine for small query sets; cost is
  |Q|·|corpus|.
- LSH-bucketed ANN (random hyperplanes): deterministic pseudo-random
  hyperplane signs derived from md5(plane:dim), signature = sign-bit string,
  candidates restricted to the query's bucket. The 100 TB path: buckets
  shard the corpus so each query probes |corpus| / 2^planes rows.

An IVF variant (k-means coarse quantizer via pyspark.ml) is sketched in
plans/similarity.py docstrings; LSH is the default because it needs no
training pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic accumulation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_brute(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Ranking key is (round(cos,6) DESC, id) so ordering is stable across
    engines; the rounded similarity is also the emitted value.

    The L2 norms are projected ONCE PER ROW on each side before the cross
    join instead of inside the per-pair cosine: the norm is an interpreted
    higher-order fold (aggregate over zip_with), so evaluating it per pair
    made each pair pay 3 folds where 1 (the dot product) is fundamental —
    measured 0.85 -> 0.65 s on cosine_topk at sf0.1. Bit-identical to the
    fused form: the SAME fold expression produces the norm value, only its
    evaluation count changes, and dot/(qn*cn) sees identical operands.
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(F.col(vec_col)).alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(F.col(vec_col)).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signs(n_planes: int, dims: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane components from md5 parity — no RNG state,
    reproducible on any engine/driver."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dims):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) < 8 else -1)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[int]]) -> Column:
    """Bucket id = bits of sign(plane · vec)."""
    bucket = F.lit(0).cast("bigint")
    for p, signs in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                as_double_array(vec_col),
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.shiftleft(F.lit(1).cast("bigint"), p)).otherwise(0)
    return bucket


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's hyperplane bucket.

    Join is an equi-join on bucket — at scale each probe touches
    ~|corpus|/2^n_planes rows instead of the full corpus.
    """
    from pyspark.sql.window import Window

    planes = hyperplane_signs(n_planes, dims)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(F.col(vec_col)).alias("qv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("cv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_near_dup_blocked(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    n_blocks: int = 16,
) -> DataFrame:
    """Exact all-pairs cosine near-dup via block-matrix multiplication.

    The naive pair join evaluates the dot-product fold per pair — O(n²·d)
    interpreted lambda steps (63 s for 5 k vectors at sf0.1). Here vectors
    are hashed into B blocks, the B·(B+1)/2 block pairs become rows of a
    small cross join, and each block pair runs ONE numpy GEMM inside an
    Arrow-batched ``mapInPandas`` (~10⁴× fewer interpreter transitions).
    This is the standard distributed exact-similarity layout: work scales as
    O(n²·d / cores) flops in BLAS, shuffle volume as O(n·d·B) (each block
    ships to B partners), and B tunes the memory-per-task envelope.
    Emitted pairs are (min_id, max_id) so each unordered pair appears once.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    blocks = (
        emb.select(
            F.col(id_col).alias("vid"),
            as_double_array(F.col(vec_col)).alias("v"),
            (F.col(id_col) % n_blocks).alias("block"),
        )
        .groupBy("block")
        .agg(F.collect_list(F.struct("vid", "v")).alias("items"))
    )
    pairs = (
        blocks.select(
            F.col("block").alias("block_a"), F.col("items").alias("items_a")
        )
        .join(
            blocks.select(
                F.col("block").alias("block_b"), F.col("items").alias("items_b")
            ),
            F.col("block_a") <= F.col("block_b"),
        )
        # spread the B*(B+1)/2 GEMM tasks across the cluster
        .repartition(n_blocks * (n_blocks + 1) // 2)
    )

    def gemm(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ia = np.asarray([x["vid"] for x in row["items_a"]], dtype=np.int64)
                ib = np.asarray([x["vid"] for x in row["items_b"]], dtype=np.int64)
                ma = np.vstack([np.asarray(x["v"], dtype=np.float64) for x in row["items_a"]])
                mb = np.vstack([np.asarray(x["v"], dtype=np.float64) for x in row["items_b"]])
                ma /= np.linalg.norm(ma, axis=1, keepdims=True)
                mb /= np.linalg.norm(mb, axis=1, keepdims=True)
                cos = np.round(ma @ mb.T, 6)
                same = row["block_a"] == row["block_b"]
                ii, jj = np.nonzero(cos >= threshold)
                if same:
                    keep = ia[ii] < ib[jj]
                else:
                    keep = ia[ii] != ib[jj]
                ii, jj = ii[keep], jj[keep]
                lo = np.minimum(ia[ii], ib[jj])
                hi = np.maximum(ia[ii], ib[jj])
                yield pd.DataFrame(
                    {"id_a": lo, "id_b": hi, "cosine_sim": cos[ii, jj]}
                )

    return pairs.mapInPandas(gemm, out_schema)


def cosine_near_dup_lsh(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    n_planes: int = 6,
    dims: int = 64,
    max_block: int = 4096,
) -> DataFrame:
    """Sub-quadratic near-duplicate pairs: hyperplane-LSH bucketing composed
    with per-bucket exact GEMM verification — the 100 TB production path.

    ``cosine_near_dup_blocked`` is the right layout for EXACT all-pairs but
    its flops are O(n²·d) no matter how they're blocked; at corpus scale the
    candidate set must shrink first. Here every vector lands in one of
    2^n_planes deterministic hyperplane buckets (the md5-parity planes of
    ``ann_lsh_topk`` — engine-reproducible, so a SQL oracle can rebuild the
    IDENTICAL pair set), and the exact GEMM runs only within a bucket:
    expected flops drop by ~2^n_planes. Recall < 1 by design (pairs
    straddling a hyperplane are missed); the exact variant remains the
    reference semantics at small n.

    Memory safety at scale: a bucket larger than ``max_block`` rows is split
    into sub-blocks (hash of id), and the within-bucket work becomes
    sub-block PAIRS — the blocked-GEMM envelope applied per bucket, so no
    task ever materializes more than 2·max_block vectors regardless of how
    skewed the bucket distribution is. Buckets are disjoint, so each
    unordered pair is emitted at most once; output is (min_id, max_id).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )
    planes = hyperplane_signs(n_planes, dims)
    # Bucket occupancy via a map-side-combined aggregate + broadcast join,
    # NOT a count(*) window: the window shuffled + sorted the FULL vector
    # payload by bucket only to attach one integer, and the groupBy below
    # then shuffled the payload a second time on (bucket, sub). The
    # aggregate shuffles 2^n_planes count rows instead, so the heavy
    # vectors cross the network exactly once (guide §2.3/§8: decide with
    # small rows, move big rows once).
    sized = emb.select(
        F.col(id_col).alias("vid"),
        as_double_array(F.col(vec_col)).alias("v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        # barrier (r13 advice): sized feeds BOTH the occupancy aggregate
        # and the main join — without it the upstream scan + bucket
        # hashing runs twice per action, giving back part of the saved
        # payload shuffle
    ).localCheckpoint(eager=False)
    n_sub = F.broadcast(
        sized.groupBy("bucket").agg(
            F.ceil(F.count("*") / F.lit(float(max_block)))
            .cast("int")
            .alias("n_sub")
        )
    )
    base = sized.join(n_sub, "bucket").withColumn(
        # hash of id, not the raw id: structured id spaces (e.g. all-even
        # ids) would collapse residue classes into one sub-block and void
        # the <= 2*max_block per-task memory bound; output is invariant to
        # the assignment (every sub-block pair is compared).
        "sub",
        F.pmod(F.xxhash64(F.col("vid")), F.col("n_sub")).cast("int"),
    )
    blocks = base.groupBy("bucket", "sub").agg(
        F.collect_list(F.struct("vid", "v")).alias("items")
    )
    pairs = (
        blocks.select(
            "bucket", F.col("sub").alias("sub_a"), F.col("items").alias("items_a")
        )
        .join(
            blocks.select(
                "bucket", F.col("sub").alias("sub_b"), F.col("items").alias("items_b")
            ),
            "bucket",
        )
        .filter(F.col("sub_a") <= F.col("sub_b"))
        # one GEMM task per (bucket, sub-block pair); hash-spread over the
        # cluster so a few big buckets don't serialize on one executor
        .repartition("bucket", "sub_a", "sub_b")
    )

    def gemm(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ia = np.asarray([x["vid"] for x in row["items_a"]], dtype=np.int64)
                ib = np.asarray([x["vid"] for x in row["items_b"]], dtype=np.int64)
                ma = np.vstack([np.asarray(x["v"], dtype=np.float64) for x in row["items_a"]])
                mb = np.vstack([np.asarray(x["v"], dtype=np.float64) for x in row["items_b"]])
                ma /= np.linalg.norm(ma, axis=1, keepdims=True)
                mb /= np.linalg.norm(mb, axis=1, keepdims=True)
                cos = np.round(ma @ mb.T, 6)
                same = row["sub_a"] == row["sub_b"]
                ii, jj = np.nonzero(cos >= threshold)
                if same:
                    keep = ia[ii] < ib[jj]
                else:
                    keep = ia[ii] != ib[jj]
                ii, jj = ii[keep], jj[keep]
                lo = np.minimum(ia[ii], ib[jj])
                hi = np.maximum(ia[ii], ib[jj])
                yield pd.DataFrame(
                    {"id_a": lo, "id_b": hi, "cosine_sim": cos[ii, jj]}
                )

    return pairs.mapInPandas(gemm, out_schema)


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: KMeans coarse quantizer + cell-restricted scan.

    The inverted-file alternative to hyperplane LSH (``ann_lsh_topk``):
    a k-means pass learns ``n_cells`` centroids (pyspark.ml — distributed
    Lloyd, seed 42); every corpus vector lands in its nearest cell; a query
    probes its ``n_probe`` closest cells and scores exact cosine only there.
    At scale each probe touches ~|corpus|·n_probe/n_cells rows, and the
    centroid table (n_cells × d doubles) broadcasts. Train-once/probe-many:
    the model fit is the indexing pass a real deployment would persist.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.window import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("cv"),
    ).withColumn("features", array_to_vector(F.col("cv")))
    model = KMeans(k=n_cells, seed=42, featuresCol="features").fit(c)
    assigned = model.transform(c).select(
        "neighbor_id", "cv", F.col("prediction").alias("cell")
    )

    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "cell INT, centroid ARRAY<DOUBLE>",
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(F.col(vec_col)).alias("qv")
    )
    # squared euclidean to each centroid (KMeans' metric); keep n_probe cells
    d2 = F.aggregate(
        F.zip_with("qv", "centroid", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.col("d2"), F.col("cell"))
    probed = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("d2", d2)
        .withColumn("cell_rank", F.row_number().over(probe_w))
        .filter(F.col("cell_rank") <= n_probe)
        .select("query_id", "qv", "cell")
    )

    scored = (
        probed.join(assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cell",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def sq_l2(a: Column, b: Column) -> Column:
    """Squared euclidean distance via three sequential-fold dot products:
    ||a||^2 - 2<a,b> + ||b||^2. Composed this way (rather than folding
    (x-y)^2 directly) so a SQL oracle can mirror it term-for-term with
    list_dot_product — identical IEEE operations in identical order on
    both engines."""
    return dot(a, a) - F.lit(2.0) * dot(a, b) + dot(b, b)


def ann_ivf_fixed_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    n_queries: int = 5,
) -> DataFrame:
    """IVF approximate top-k with a DETERMINISTIC codebook: the
    ``n_cells`` lowest-id corpus vectors ARE the centroids.

    Same inverted-file structure as ``ann_ivf_topk`` (assign every vector
    to its nearest cell; a query probes its ``n_probe`` closest cells and
    scores exact cosine only there) but with the KMeans training pass
    replaced by a fixed codebook — which makes every step reproducible in
    portable SQL, so the WHOLE pipeline sits under the value-oracle gate
    (ann_ivf_topk's trained quantizer keeps the recall-floor pytest
    instead). Production IVF treats the codebook as a persisted input
    artifact anyway; pinning it to data rows changes recall, not the
    operator. Distances round to 6dp with cell-id tiebreak, cosine to 6dp
    with neighbor-id tiebreak — the determinism convention of the other
    similarity oracles."""
    from pyspark.sql.window import Window

    c = corpus.select(
        F.col(id_col).alias("vid"), as_double_array(F.col(vec_col)).alias("v")
    )
    # first-n selection via orderBy().limit(n) — TakeOrderedAndProject, a
    # distributed per-partition top-n + tiny driver merge. A global
    # row_number window over the corpus would funnel EVERY row through one
    # task; the windows below run only over the already-limited n rows.
    first_n = Window.orderBy("vid")
    cents = (
        c.orderBy("vid")
        .limit(n_cells)
        .withColumn("__rn", F.row_number().over(first_n))
        .select(
            (F.col("__rn") - 1).cast("int").alias("cell"),
            F.col("v").alias("cvec"),
        )
    )
    d2r = F.round(sq_l2(F.col("v"), F.col("cvec")), 6)
    assign_w = Window.partitionBy("vid").orderBy("d2r", "cell")
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("d2r", d2r)
        .withColumn("__rn", F.row_number().over(assign_w))
        .filter(F.col("__rn") == 1)
        .select(F.col("vid").alias("neighbor_id"), F.col("v").alias("cv"), "cell")
    )
    q = (
        c.orderBy("vid")
        .limit(n_queries)
        .select(F.col("vid").alias("query_id"), F.col("v").alias("qv"))
    )
    probe_w = Window.partitionBy("query_id").orderBy("d2r", "cell")
    probed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("d2r", F.round(sq_l2(F.col("qv"), F.col("cvec")), 6))
        .withColumn("__rn", F.row_number().over(probe_w))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    scored = (
        probed.join(assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cell",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_adc_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_sub: int = 8,
    d_sub: int = 8,
    n_codes: int = 16,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation (ADC),
    deterministic-codebook variant: split each vector into ``n_sub``
    subvectors, encode every subvector as its nearest codeword (codebook =
    subvectors of the ``n_codes`` lowest-id corpus vectors — the persisted-
    artifact stand-in, same convention as ann_ivf_fixed_topk), and rank
    candidates for the query (vector 0) by the sum of per-subspace
    query→codeword distance-table lookups. Emits approx vs exact squared
    distance side by side so the quantization error is visible per row.

    This is the memory side of large-scale ANN: vectors compress
    64 doubles → n_sub code bytes (64x), the distance table is
    n_sub×n_codes and broadcast, and scoring a candidate is n_sub integer
    lookups + a fixed-order sum — no float vector math per candidate. All
    argmins round to 6dp with code-id tiebreaks and the ADC sum adds its 8
    lanes in one fixed order, so the whole operator value-matches a SQL
    oracle."""
    from pyspark.sql.window import Window

    v = corpus.select(
        F.col(id_col).alias("vec_id"), as_double_array(F.col(vec_col)).alias("e")
    )
    first_n = Window.orderBy("vec_id")
    cb = (
        v.orderBy("vec_id")
        .limit(n_codes)
        .withColumn("k", (F.row_number().over(first_n) - 1).cast("int"))
    )
    ms = F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("m")
    sub = cb.select("k", ms, "e").select(
        "k", "m", F.expr(f"slice(e, m * {d_sub} + 1, {d_sub})").alias("ce")
    )
    vsub = v.select("vec_id", ms, "e").select(
        "vec_id", "m", F.expr(f"slice(e, m * {d_sub} + 1, {d_sub})").alias("ve")
    )
    enc0 = vsub.join(F.broadcast(sub), "m").select(
        "vec_id",
        "m",
        "k",
        F.round(sq_l2(F.col("ve"), F.col("ce")), 6).alias("d2"),
    )
    argmin = Window.partitionBy("vec_id", "m").orderBy("d2", "k")
    codes = (
        enc0.withColumn("__rn", F.row_number().over(argmin))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "m", "k")
    )
    dt = (
        vsub.filter(F.col("vec_id") == 0)
        .join(F.broadcast(sub), "m")
        .select(
            "m",
            "k",
            F.round(sq_l2(F.col("ve"), F.col("ce")), 6).alias("qd2"),
        )
    )
    lanes = [
        F.max(F.when(F.col("m") == i, F.col("qd2"))).alias(f"t{i}")
        for i in range(n_sub)
    ]
    adc = (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(dt), ["m", "k"])
        .groupBy("vec_id")
        .agg(*lanes)
    )
    # fixed-order lane sum — identical operand bits + identical order on
    # both engines, so the double result is bit-equal
    total = F.col("t0")
    for i in range(1, n_sub):
        total = total + F.col(f"t{i}")
    qv = v.filter(F.col("vec_id") == 0).select(F.col("e").alias("qe"))
    scored = (
        adc.select(
            F.col("vec_id").alias("neighbor_id"),
            F.round(total, 6).alias("approx_d2"),
        )
        .join(
            v.select(F.col("vec_id").alias("neighbor_id"), "e"), "neighbor_id"
        )
        .crossJoin(F.broadcast(qv))
        .select(
            "neighbor_id",
            "approx_d2",
            F.round(sq_l2(F.col("e"), F.col("qe")), 6).alias("exact_d2"),
        )
    )
    top = scored.orderBy("approx_d2", "neighbor_id").limit(k)
    w = Window.orderBy("approx_d2", "neighbor_id")
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
