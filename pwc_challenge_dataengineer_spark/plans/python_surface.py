"""Python execution surface beyond scalar pandas_udf — a grouped-agg pandas
UDAF and a Python UDTF, each proven equal to its relational formulation by
the DuckDB oracle. The reference has NO UDAF/UDTF anywhere (SURVEY §2.10);
these close the remaining PySpark Python-API surface so a user migrating
custom aggregations/table functions has a tested template.

- weighted_median_udaf  Arrow grouped-agg pandas_udf (true UDAF): weighted
  median of extended price by quantity per return flag. All arithmetic is
  integer-exact inside doubles (quantities are integral), so the pandas
  fold and the oracle's window SQL agree bit-for-bit.
- udtf_token_positions  Python UDTF (Spark 4 lateral table function)
  emitting (token, position) rows; oracle is the zipped-unnest SQL.

Scale posture: the UDAF ships one Arrow batch per group — fine while every
group fits an executor (here: 3 return flags x ~2M rows/group at sf100 —
use the sort-based window formulation beside it when groups outgrow
memory). The UDTF is the row-at-a-time slow path by construction; the
oracle-equal explode formulation (plans/pii_text.py, plans/text_retrieval
tokenizers) is the production path — this query exists to keep the API
template tested, pinned to the fast path's semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..schemas import load_table
from .catalog import register


# NB: @pandas_udf / @udtf parse their DDL return types eagerly, which needs
# an active SparkSession — so both are constructed inside the query
# functions, not at import time. (pd stays module-imported: the UDF's type
# hints must resolve against the module-level pandas.)


def _make_weighted_median():
    @pandas_udf("double")
    def _weighted_median(v: pd.Series, w: pd.Series) -> float:
        """Smallest v whose cumulative weight reaches half the total (the
        lower weighted median — the same convention as the oracle SQL)."""
        d = pd.DataFrame({"v": v, "w": w}).sort_values("v", kind="mergesort")
        cw = d["w"].cumsum()
        return float(d.loc[cw >= d["w"].sum() * 0.5, "v"].iloc[0])

    return _weighted_median


@register(
    "weighted_median_udaf",
    oracle="""
    WITH t AS (
        SELECT l_returnflag, l_extendedprice AS v,
               SUM(l_quantity) OVER (
                   PARTITION BY l_returnflag ORDER BY l_extendedprice
                   ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
        FROM lineitem
    )
    SELECT l_returnflag, MIN(v) AS weighted_median
    FROM t WHERE cw >= 0.5 * tot GROUP BY 1
    """,
)
def weighted_median_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of extended price per return flag via a
    grouped-agg pandas UDF — the PySpark UDAF. Weights are integral, so
    cumulative sums are exact in doubles and the threshold comparison
    cannot flake across engines or tie orders (equal-v ties all carry the
    same v, so the crossing row's value is order-invariant). The oracle
    computes the identical lower weighted median with window SQL — which
    is also the formulation to use when a single group outgrows executor
    memory."""
    li = load_table(spark, sf_dir, "lineitem")
    wmed = _make_weighted_median()
    return li.groupBy("l_returnflag").agg(
        wmed("l_extendedprice", "l_quantity").alias("weighted_median")
    )


def _make_token_positions():
    @udtf(returnType="tok: string, pos: int")
    class _TokenPositions:
        """Yield (token, 0-based position) for a whitespace-tokenized string."""

        def eval(self, text: str):  # noqa: D102
            if text is None:
                return
            for i, tok in enumerate(text.lower().strip().split()):
                yield tok, i

    return _TokenPositions


@register(
    "udtf_token_positions",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    )
    SELECT doc_id, tok, pos FROM (
        SELECT doc_id, unnest(t) AS tok,
               CAST(unnest(range(len(t))) AS INT) AS pos
        FROM toks
    ) WHERE pos < 5
    """,
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First five (token, position) rows per document via a Python UDTF in
    a lateral join — the Spark 4 table-function surface. Python's
    str.split() on whitespace equals the '\\s+' regex split of the
    relational path, and the oracle's zipped unnest pins that equivalence.
    Production tokenization stays on explode (JVM-side); this keeps the
    UDTF template correct and continuously tested."""
    docs = load_table(spark, sf_dir, "documents")
    spark.udtf.register("token_positions", _make_token_positions())
    docs.createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok, t.pos
        FROM udtf_docs_v d, LATERAL token_positions(d.text) t
        WHERE t.pos < 5
        """
    )


@register(
    "arrow_vector_norms",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n_dims,
           round(sqrt(list_reduce(
               list_prepend(0.0::DOUBLE,
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
               (acc, x) -> acc + x)), 6) AS l2_norm
    FROM embeddings
    """,
)
def arrow_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms computed through mapInArrow — the zero-copy Arrow-native
    Python path (one step lower-level than pandas UDFs: raw RecordBatch
    in, RecordBatch out, no pandas conversion). Same statistic as
    vector_norms (HOF fold) but exercising the third Python execution
    surface after pandas_udf and applyInPandas; the Python loop
    replicates the identical left fold with zero seed that the oracle's
    list_reduce runs, so even this crosses the engine boundary
    hash-exact. Embarrassingly parallel: one batch in, one batch out,
    no shuffle at any scale."""
    import math

    import pyarrow as pa

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def norms(batches):
        for batch in batches:
            vec_ids = batch.column("vec_id").to_pylist()
            arrs = batch.column("embedding").to_pylist()
            out_n, out_norm = [], []
            for a in arrs:
                acc = 0.0
                for x in a:
                    xd = float(x)
                    acc = acc + xd * xd
                out_n.append(len(a))
                out_norm.append(round(math.sqrt(acc), 6))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(vec_ids, pa.int64()),
                    pa.array(out_n, pa.int32()),
                    pa.array(out_norm, pa.float64()),
                ],
                names=["vec_id", "n_dims", "l2_norm"],
            )

    return emb.mapInArrow(norms, "vec_id bigint, n_dims int, l2_norm double")


@register(
    "cogroup_pandas_asof",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts, CAST(MAX(value) AS DOUBLE) AS err_value
        FROM events WHERE event_type = 'error' GROUP BY 1, 2
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.err_value AS asof_err_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def cogroup_pandas_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COGROUP half of the Python surface:
    ``groupby(k).cogroup(df2.groupby(k)).applyInPandas`` — two relations
    co-partitioned on the key, each group pair handed to pandas as a
    batch, here running ``pd.merge_asof`` per user (each purchase picks
    up the user's latest error value at or before it). Same semantics as
    asof_purchase_click's pure-DataFrame union-sort plan, which is the
    production path; this entry exists because cogroup is the one
    Arrow-batched API a pandas-native algorithm (merge_asof,
    np.interp-style alignment, per-pair statsmodels fits) actually
    needs, and the plumbing — co-shuffle, per-key batch shapes, nullable
    bigint round trip through Arrow — deserves its own oracle.

    Scale: ONE co-shuffle on user_id for both sides, then per-group
    pandas; group size is a user's event history (bounded), never the
    corpus. Right side pre-deduped per (user, ts) so tie semantics are
    unambiguous in both engines."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").cast("double").alias("err_value"))
    )
    # Pin the co-shuffle's parallelism: this stage's cost is per-GROUP (one
    # pandas merge_asof call each), which AQE's byte-based partition
    # coalescing cannot see — at bench SF it folds the ~MB co-shuffle down
    # to one task and serializes every group call through one Python
    # worker. An explicit numPartitions opts this exchange out of
    # coalescing; defaultParallelism tracks cluster cores, so the pin
    # stays correct at any scale.
    n_par = spark.sparkContext.defaultParallelism
    purchases = purchases.repartition(n_par, "user_id")
    errors = errors.repartition(n_par, "user_id")

    def merge_group(purch: pd.DataFrame, err: pd.DataFrame) -> pd.DataFrame:
        if purch.empty:
            return purch.assign(asof_err_value=pd.Series(dtype="float64"))
        purch = purch.sort_values("ts", kind="mergesort")
        if err.empty:
            out = purch.copy()
            out["asof_err_value"] = pd.Series(
                [None] * len(out), dtype="float64", index=out.index
            )
            return out
        err = err.sort_values("ts", kind="mergesort")[["ts", "err_value"]]
        out = pd.merge_asof(
            purch, err, on="ts", direction="backward"
        ).rename(columns={"err_value": "asof_err_value"})
        return out

    return (
        purchases.groupBy("user_id")
        .cogroup(errors.groupBy("user_id"))
        .applyInPandas(
            merge_group,
            "event_id bigint, user_id bigint, ts timestamp_ntz, "
            "value double, asof_err_value double",
        )
    )
