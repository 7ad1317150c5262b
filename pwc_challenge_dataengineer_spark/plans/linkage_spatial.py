"""Record linkage and spatial-join operator families (beyond-reference;
complements the token-set fuzzy matching in fuzzy_part_name_pairs and the
banded range join in operators/asof.py).

- levenshtein_linkage  blocked edit-distance record linkage over part
  names: block on the name's head noun (last word), band on length, then
  verify with Levenshtein — the classic Fellegi-Sunter-style blocking
  pipeline, with the quadratic comparison confined to blocks.
- grid_spatial_knn     nearest-supplier-within-radius per customer over
  deterministic pseudo-coordinates, via a grid-cell bucketed neighbor
  join (9-cell probe) — the standard scale shape for spatial kNN: a
  bounded cell join instead of a cross product.

Parity: both queries are exact-integer/string computations end-to-end
(Levenshtein is an integer; the grid geometry runs in integer deci-units,
so distance ranking compares exact bigints); the only doubles are final
single-division similarity/distance outputs on identical operands.

Scale posture: linkage cost is sum over blocks of |block|^2 bounded by the
length band (no global cross join); the spatial join shuffles on cell id
with per-cell fan-out capped by the 9-probe pattern, and skewed cells can
reuse the salted-join kit in operators/scalable.py. Reference parity: the
reference's fuzzy/duplicate matching lives in its pandas/Polars silver
cleaning (src/etl/silver) — re-expressed here as set-based Spark plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_table
from .catalog import register


@register(
    "levenshtein_linkage",
    oracle="""
    WITH names AS (
        SELECT p_name, CAST(COUNT(*) AS BIGINT) AS cnt,
               regexp_extract(p_name, '(\\S+)$', 1) AS block,
               CAST(length(p_name) AS INT) AS ln
        FROM part GROUP BY 1
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev,
           ROUND(1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
                       / greatest(a.ln, b.ln), 6) AS similarity,
           a.cnt * b.cnt AS n_record_pairs
    FROM names a
    JOIN names b
      ON a.block = b.block
     AND a.p_name < b.p_name
     AND abs(a.ln - b.ln) <= 3
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 5
    """,
)
def levenshtein_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance record linkage at the DICTIONARY level: the
    part names fold to their distinct values first (with multiplicities),
    then candidate name pairs that share a blocking key (the name's last
    word) and sit within a length band are verified by Levenshtein
    distance 1..5; each verified name pair carries the number of record
    pairs it links (cnt_a x cnt_b). Folding to the dictionary is what
    makes linkage over a low-cardinality attribute scale-sane: the
    quadratic comparison runs over the (bounded) vocabulary, never over
    the records — the record-level pair count grows with SF^2 while this
    output stays dictionary-sized. Exact-duplicate names (lev 0) are the
    exact-dedup family's job and are excluded here.

    Exact-integer parity: Levenshtein, lengths, and multiplicity products
    are integers in both engines; similarity is a single IEEE division on
    identical operands."""
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            "p_name",
            "cnt",
            F.regexp_extract("p_name", r"(\S+)$", 1).alias("block"),
            F.length("p_name").cast("int").alias("ln"),
        )
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("cnt").alias("cnt_a"),
        "block",
        F.col("ln").alias("ln_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("cnt").alias("cnt_b"),
        "block",
        F.col("ln").alias("ln_b"),
    )
    lev = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "block")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("ln_a") - F.col("ln_b")) <= 3)
        )
        .filter((lev >= 1) & (lev <= 5))
        .select(
            "name_a",
            "name_b",
            lev.cast("int").alias("lev"),
            F.round(
                1.0
                - lev.cast("double") / F.greatest("ln_a", "ln_b"),
                6,
            ).alias("similarity"),
            (F.col("cnt_a") * F.col("cnt_b")).alias("n_record_pairs"),
        )
    )


# Deterministic pseudo-coordinates in integer deci-units on a 10000x10000
# grid (0..9999 per axis = 0..999.9 "units"): LCG-style mixes of the keys,
# computed identically in Spark and DuckDB with plain BIGINT arithmetic (no
# hash function, no float) so the geometry is bit-identical cross-engine.
_CELL = 500  # 50-unit cells in deci-units
_R2 = 500 * 500  # radius = one cell width, squared, in deci-units^2


@register(
    "grid_spatial_knn",
    oracle=f"""
    WITH cust AS (
        SELECT c_custkey,
               (c_custkey * 48271 + 11) % 10000 AS pxi,
               (c_custkey * 69621 + 7) % 10000 AS pyi
        FROM customer
    ),
    supp AS (
        SELECT s_suppkey,
               (s_suppkey * 40503 + 3) % 10000 AS sxi,
               (s_suppkey * 16807 + 5) % 10000 AS syi
        FROM supplier
    ),
    probes AS (
        SELECT c.c_custkey, c.pxi, c.pyi,
               CAST(FLOOR(c.pxi / {_CELL}.0) AS BIGINT) + dx.v AS cx,
               CAST(FLOOR(c.pyi / {_CELL}.0) AS BIGINT) + dy.v AS cy
        FROM cust c,
             (VALUES (-1), (0), (1)) dx(v),
             (VALUES (-1), (0), (1)) dy(v)
    ),
    hits AS (
        SELECT p.c_custkey, s.s_suppkey, p.pxi, p.pyi, s.sxi, s.syi,
               (p.pxi - s.sxi) * (p.pxi - s.sxi)
               + (p.pyi - s.syi) * (p.pyi - s.syi) AS d2
        FROM probes p
        JOIN supp s
          ON p.cx = CAST(FLOOR(s.sxi / {_CELL}.0) AS BIGINT)
         AND p.cy = CAST(FLOOR(s.syi / {_CELL}.0) AS BIGINT)
        WHERE (p.pxi - s.sxi) * (p.pxi - s.sxi)
              + (p.pyi - s.syi) * (p.pyi - s.syi) <= {_R2}
    ),
    ranked AS (
        SELECT c_custkey, s_suppkey, d2,
               row_number() OVER (PARTITION BY c_custkey
                                  ORDER BY d2, s_suppkey) AS rn
        FROM hits
    )
    SELECT c_custkey,
           s_suppkey AS nearest_suppkey,
           CAST(d2 AS BIGINT) AS dist2_deci,
           ROUND(sqrt(CAST(d2 AS DOUBLE)) / 10.0, 6) AS dist_units
    FROM ranked WHERE rn = 1
    """,
)
def grid_spatial_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier within a 50-unit radius for every customer, on
    deterministic pseudo-coordinates, via grid-cell bucketing: each customer
    probes its cell plus the 8 neighbors (cell width == search radius
    guarantees full coverage), suppliers are joined on exact cell id, and the
    winner is the min squared distance with a key tiebreak.

    The geometry runs entirely in integer deci-units, so candidate
    filtering and ranking compare exact BIGINTs — no float tolerance
    anywhere; the output distance is one sqrt+division on an exact integer.

    Scale shape: a 9-cell bucketed equi-join (shuffle on cell id) instead
    of a customer x supplier cross join; per-task fan-out is bounded by
    cell occupancy, and a skewed cell would take the salted-join kit
    (operators/scalable.py) unchanged."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 48271 + 11) % 10000).alias("pxi"),
        ((F.col("c_custkey") * 69621 + 7) % 10000).alias("pyi"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 40503 + 3) % 10000).alias("sxi"),
        ((F.col("s_suppkey") * 16807 + 5) % 10000).alias("syi"),
    ).select(
        "s_suppkey",
        "sxi",
        "syi",
        F.floor(F.col("sxi") / float(_CELL)).cast("bigint").alias("scx"),
        F.floor(F.col("syi") / float(_CELL)).cast("bigint").alias("scy"),
    )
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probes = (
        cust.select(
            "c_custkey", "pxi", "pyi", F.explode(off).alias("dx")
        )
        .select("c_custkey", "pxi", "pyi", "dx", F.explode(off).alias("dy"))
        .select(
            "c_custkey",
            "pxi",
            "pyi",
            (
                F.floor(F.col("pxi") / float(_CELL)).cast("bigint")
                + F.col("dx")
            ).alias("cx"),
            (
                F.floor(F.col("pyi") / float(_CELL)).cast("bigint")
                + F.col("dy")
            ).alias("cy"),
        )
    )
    d2 = (F.col("pxi") - F.col("sxi")) * (F.col("pxi") - F.col("sxi")) + (
        F.col("pyi") - F.col("syi")
    ) * (F.col("pyi") - F.col("syi"))
    # no broadcast hint: AQE broadcasts the supplier side while it fits and
    # reverts to the cell-id shuffle join past the envelope — which is the
    # 100 TB shape the docstring describes
    hits = (
        probes.join(
            supp,
            (F.col("cx") == F.col("scx")) & (F.col("cy") == F.col("scy")),
        )
        .withColumn("d2", d2)
        .filter(F.col("d2") <= _R2)
    )
    w = Window.partitionBy("c_custkey").orderBy("d2", "s_suppkey")
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("s_suppkey").alias("nearest_suppkey"),
            F.col("d2").cast("bigint").alias("dist2_deci"),
            F.round(F.sqrt(F.col("d2").cast("double")) / 10.0, 6).alias(
                "dist_units"
            ),
        )
    )


@register(
    "sorted_neighborhood_pairs",
    oracle="""
    WITH named AS (
        SELECT p_partkey, p_name, CAST(length(p_name) AS INT) AS ln
        FROM part
    ),
    seq AS (
        SELECT p_partkey, p_name, ln,
               lead(p_partkey, 1) OVER w AS k1,
               lead(p_name, 1)    OVER w AS n1,
               lead(p_partkey, 2) OVER w AS k2,
               lead(p_name, 2)    OVER w AS n2,
               lead(p_partkey, 3) OVER w AS k3,
               lead(p_name, 3)    OVER w AS n3
        FROM named
        WINDOW w AS (ORDER BY p_name, p_partkey)
    ),
    pairs AS (
        SELECT p_partkey AS part_a, p_name AS name_a,
               k1 AS part_b, n1 AS name_b, 1 AS nbr_offset FROM seq
        WHERE k1 IS NOT NULL
        UNION ALL
        SELECT p_partkey, p_name, k2, n2, 2 FROM seq WHERE k2 IS NOT NULL
        UNION ALL
        SELECT p_partkey, p_name, k3, n3, 3 FROM seq WHERE k3 IS NOT NULL
    )
    SELECT part_a, part_b, name_a, name_b,
           CAST(nbr_offset AS INT) AS nbr_offset,
           CAST(levenshtein(name_a, name_b) AS INT) AS lev
    FROM pairs
    WHERE levenshtein(name_a, name_b) <= 5
    """,
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage: sort records by the comparison
    key and compare each record only to its next 3 neighbors in sort order
    — the complementary blocking strategy to levenshtein_linkage (head-noun
    blocks miss pairs whose last word differs; a sorted scan catches pairs
    that agree on a long prefix regardless of block).

    Scale posture: the sort is RANGE-PARTITIONED, not a single global
    window — rows partition on the first word of p_name (a fixed palette,
    so blocks are contiguous in (p_name, p_partkey) order because the
    space separator sorts below every letter), each block computes its
    lead-1..3 pairs inside its own partition, and the w-row cross-boundary
    overlap is generated explicitly: the first/last 3 rows of every block
    form a candidate set bounded by 6 x |palette| rows (SF-independent),
    and one window over that tiny set reproduces the straddling pairs with
    their exact global offsets. Proof sketch: any pair at global offset
    <= 3 whose endpoints sit in different blocks has every intervening row
    within 3 of a block edge (a whole block between them would force the
    offset past 3), so the candidate set is gap-free where it matters and
    lead() inside it equals the global lead. Exact integers/strings
    throughout."""
    named = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_name")
        .withColumn("pk", F.split(F.col("p_name"), " ").getItem(0))
    )
    w_blk = Window.partitionBy("pk").orderBy("p_name", "p_partkey")
    lead_cols = [
        c
        for o in (1, 2, 3)
        for c in (
            F.lead("p_partkey", o).over(w_blk).alias(f"k{o}"),
            F.lead("p_name", o).over(w_blk).alias(f"n{o}"),
        )
    ]
    seq = named.select(
        "p_partkey",
        "p_name",
        "pk",
        F.row_number().over(w_blk).alias("rn"),
        F.count("*").over(Window.partitionBy("pk")).alias("cnt"),
        *lead_cols,
    )

    within = [
        seq.filter(F.col(f"k{o}").isNotNull()).select(
            F.col("p_partkey").alias("part_a"),
            F.col(f"k{o}").alias("part_b"),
            F.col("p_name").alias("name_a"),
            F.col(f"n{o}").alias("name_b"),
            F.lit(o).cast("int").alias("nbr_offset"),
        )
        for o in (1, 2, 3)
    ]
    # Cross-boundary overlap: head-3 / tail-3 of each block (bounded by
    # the palette size), one tiny window, keep only block-straddling pairs.
    border_src = seq.filter(
        (F.col("rn") <= 3) | (F.col("rn") > F.col("cnt") - 3)
    ).select("p_partkey", "p_name", "pk")
    w_border = Window.orderBy("p_name", "p_partkey")
    border_seq = border_src.select(
        "p_partkey",
        "p_name",
        "pk",
        *[
            c
            for o in (1, 2, 3)
            for c in (
                F.lead("p_partkey", o).over(w_border).alias(f"k{o}"),
                F.lead("p_name", o).over(w_border).alias(f"n{o}"),
                F.lead("pk", o).over(w_border).alias(f"pk{o}"),
            )
        ],
    )
    border = [
        border_seq.filter(
            F.col(f"k{o}").isNotNull()
            & (F.col("pk") != F.col(f"pk{o}"))
        ).select(
            F.col("p_partkey").alias("part_a"),
            F.col(f"k{o}").alias("part_b"),
            F.col("p_name").alias("name_a"),
            F.col(f"n{o}").alias("name_b"),
            F.lit(o).cast("int").alias("nbr_offset"),
        )
        for o in (1, 2, 3)
    ]
    pairs = within[0]
    for extra in within[1:] + border:
        pairs = pairs.unionAll(extra)
    lev = F.levenshtein("name_a", "name_b")
    return pairs.filter(lev <= 5).select(
        "part_a",
        "part_b",
        "name_a",
        "name_b",
        "nbr_offset",
        lev.cast("int").alias("lev"),
    )


_LP_ROUNDS = 5


def _density_oracle() -> str:
    rounds = []
    for r in range(1, _LP_ROUNDS + 1):
        rounds.append(f"""
    l{r} AS (
        SELECT l.cid,
               LEAST(l.lab, COALESCE(MIN(nb.lab), l.lab)) AS lab
        FROM l{r - 1} l
        LEFT JOIN edges e ON l.cid = e.ca
        LEFT JOIN l{r - 1} nb ON e.cb = nb.cid
        GROUP BY l.cid, l.lab
    )""")
    return f"""
    WITH pts AS (
        SELECT CAST(FLOOR(((c_custkey * 48271 + 11) % 10000) / {_CELL}.0)
                    AS BIGINT) AS cx,
               CAST(FLOOR(((c_custkey * 69621 + 7) % 10000) / {_CELL}.0)
                    AS BIGINT) AS cy
        FROM customer
    ),
    cells AS (
        SELECT cx, cy, cx * 100 + cy AS cid,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pts GROUP BY 1, 2
    ),
    th AS (
        SELECT CAST(CEIL(1.1 * AVG(cnt)) AS BIGINT) AS mp FROM cells
    ),
    core AS (SELECT c.* FROM cells c, th WHERE c.cnt >= th.mp),
    edges AS (
        SELECT a.cid AS ca, b.cid AS cb
        FROM core a JOIN core b
          ON abs(a.cx - b.cx) + abs(a.cy - b.cy) = 1
    ),
    l0 AS (SELECT cid, cid AS lab FROM core),{",".join(rounds)}
    SELECT l.lab AS cluster_label,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(c.cnt) AS BIGINT) AS n_points
    FROM l{_LP_ROUNDS} l JOIN core c ON l.cid = c.cid
    GROUP BY 1
    """


@register("grid_density_clusters", oracle=_density_oracle())
def grid_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN-style density clustering on the customer pseudo-coordinate
    grid: cells holding >= ceil(1.1 x mean cell occupancy) points are CORE
    (the data-relative threshold bites at any SF), and core cells that
    touch (4-neighborhood) merge into clusters via {_LP_ROUNDS} rounds of
    min-label propagation — the same bounded-iteration determinism
    contract as pagerank_bipartite (both engines run the identical round
    count, so partially-converged labels still hash-match; full
    convergence at cluster scale uses functions/dedup_fuzzy.py's
    components kit with its convergence probe instead).

    Scale: points fold to cells in one map-side-combined groupBy (the
    universe is the GRID, not the points), the adjacency self-join and
    per-round label joins run over core cells only, and every count is an
    exact integer."""
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.floor(((F.col("c_custkey") * 48271 + 11) % 10000) / float(_CELL))
        .cast("bigint")
        .alias("cx"),
        F.floor(((F.col("c_custkey") * 69621 + 7) % 10000) / float(_CELL))
        .cast("bigint")
        .alias("cy"),
    )
    cells = pts.groupBy("cx", "cy").agg(
        F.count("*").cast("bigint").alias("cnt")
    ).withColumn("cid", F.col("cx") * 100 + F.col("cy"))
    th = cells.agg(F.ceil(1.1 * F.avg("cnt")).cast("bigint").alias("mp"))
    # core feeds BOTH sides of the adjacency self-join, the label init and
    # the final re-join (4 consumers) — barrier it once or the cells
    # groupBy + threshold agg re-run per consumer
    core = cells.crossJoin(F.broadcast(th)).filter(
        F.col("cnt") >= F.col("mp")
    ).select("cid", "cx", "cy", "cnt").localCheckpoint(eager=False)
    a = core.select(
        F.col("cid").alias("ca"), F.col("cx").alias("ax"), F.col("cy").alias("ay")
    )
    b = core.select(
        F.col("cid").alias("cb"), F.col("cx").alias("bx"), F.col("cy").alias("by")
    )
    # broadcast twice per round (edge probe + the final join's labels):
    # without barriers each of the 5 rounds embeds TWO copies of the prior
    # round's whole subtree, 2^rounds lineage — the captured before-plan
    # held 1012 Exchange / 126 BroadcastHashJoin nodes for grid-sized data
    edges = a.join(
        b,
        F.abs(F.col("ax") - F.col("bx")) + F.abs(F.col("ay") - F.col("by"))
        == 1,
    ).select("ca", "cb").localCheckpoint(eager=False)
    lab = core.select("cid", F.col("cid").alias("lab"))
    for _ in range(_LP_ROUNDS):
        nb = lab.select(F.col("cid").alias("cb"), F.col("lab").alias("nlab"))
        lab = (
            lab.join(F.broadcast(edges), lab.cid == edges.ca, "left")
            .join(F.broadcast(nb), "cb", "left")
            .groupBy("cid", "lab")
            .agg(F.min("nlab").alias("mn"))
            .select(
                "cid",
                F.least(F.col("lab"), F.coalesce("mn", "lab")).alias("lab"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        lab.join(core, "cid")
        .groupBy(F.col("lab").alias("cluster_label"))
        .agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.sum("cnt").cast("bigint").alias("n_points"),
        )
    )


# Polygon set for the containment join: one triangle, one convex quad,
# one non-convex pentagon (tests the odd-even rule beyond convexity),
# in the module's integer deci-unit plane [0,10000)^2.
_PIP_EDGES = [
    # (polygon_id, x1, y1, x2, y2) — closed rings, edge per row
    (1, 1000, 1000, 4000, 1200), (1, 4000, 1200, 2200, 4500),
    (1, 2200, 4500, 1000, 1000),
    (2, 5000, 5000, 9000, 5200), (2, 9000, 5200, 8800, 9000),
    (2, 8800, 9000, 5200, 8800), (2, 5200, 8800, 5000, 5000),
    (3, 1000, 6000, 4000, 6000), (3, 4000, 6000, 2500, 7500),
    (3, 2500, 7500, 4000, 9000), (3, 4000, 9000, 1000, 9000),
    (3, 1000, 9000, 1000, 6000),
]


def _pip_sql(customer: str) -> str:
    """Shared ray-casting point-in-polygon SQL (identical both engines).

    Integer-exact: the ray-edge crossing test is cross-multiplied so no
    division ever happens — ((y1>py) != (y2>py)) selects edges straddling
    the horizontal ray, then the intersection-x comparison is sign-adjusted
    BIGINT arithmetic. Odd crossing count = inside (handles non-convex)."""
    edges = ", ".join(f"({p}, {a}, {b}, {c}, {d})"
                      for p, a, b, c, d in _PIP_EDGES)
    return f"""
    WITH cust AS (
        SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
               (c_custkey * 48271 + 11) % 10000 AS px,
               (c_custkey * 69621 + 7) % 10000 AS py
        FROM {customer}
    ),
    edges AS (
        SELECT * FROM (VALUES {edges}) AS t(poly_id, x1, y1, x2, y2)
    ),
    crossings AS (
        SELECT c.c_custkey, c.bal, e.poly_id,
               SUM(CASE WHEN ((e.y1 > c.py) <> (e.y2 > c.py))
                         AND (CASE WHEN e.y2 > e.y1
                              THEN (c.px - e.x1) * (e.y2 - e.y1)
                                   < (c.py - e.y1) * (e.x2 - e.x1)
                              ELSE (c.px - e.x1) * (e.y2 - e.y1)
                                   > (c.py - e.y1) * (e.x2 - e.x1)
                              END)
                    THEN 1 ELSE 0 END) AS n_cross
        FROM cust c CROSS JOIN edges e
        GROUP BY 1, 2, 3
    )
    SELECT poly_id,
           CAST(COUNT(CASE WHEN n_cross % 2 = 1 THEN 1 END) AS BIGINT)
               AS n_inside,
           CAST(SUM(CASE WHEN n_cross % 2 = 1 THEN bal END) AS DOUBLE)
               AS inside_acctbal
    FROM crossings
    GROUP BY 1
    """


@register("point_in_polygon_join", oracle=_pip_sql("customer"))
def point_in_polygon_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial containment join: which customers (at the module's
    deterministic deci-unit pseudo-coordinates) fall inside each of three
    fixed polygons (triangle / convex quad / non-convex pentagon), by
    ray-casting — odd count of edge crossings on the +x horizontal ray.
    The geofencing primitive (zone assignment, territory rollups) the
    grid-kNN query doesn't cover.

    Scale posture: the polygon ring table is literal-sized and broadcast,
    so the 'join' is a map-side |points| x |edges| predicate evaluation —
    no shuffle until the final per-polygon rollup; at real scale you'd
    pre-filter with polygon bounding boxes on the grid cells. Integer
    parity: the crossing test is cross-multiplied BIGINT (no division,
    no floats) so both engines agree exactly; the only double is the
    final DECIMAL-exact balance sum."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "pip_customer"
    )
    return spark.sql(_pip_sql("pip_customer"))


def _mutual_nn_sql(customer: str, supplier: str) -> str:
    """Shared mutual-NN SQL body (identical text on both engines).
    Reuses the module's integer geometry: 9-cell probes in each
    direction, exact BIGINT distances, key tiebreaks.

    Unlike grid_spatial_knn's fixed 10000-deci-unit plane, the plane side
    here scales with sqrt(population) (clamped at 10000 so test SFs keep
    the legacy plane): the x30 scale stress showed that inflating point
    count on a FIXED plane densifies it quadratically (86x wall at 30x
    data) — real geography grows with population, so the scale-correct
    geofence keeps density constant and candidate pairs linear."""
    probe_branches = "\n        UNION ALL ".join(
        f"""SELECT sk, sx, sy,
               CAST(FLOOR(sx / {_CELL}.0) AS BIGINT) + ({dx}) AS cx,
               CAST(FLOOR(sy / {_CELL}.0) AS BIGINT) + ({dy}) AS cy
        FROM supp"""
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    return f"""
    WITH pop AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM {customer}),
    pl AS (
        SELECT GREATEST(CAST(10000 AS BIGINT),
                        CAST(FLOOR(SQRT(n / 15000.0) * 10000.0) AS BIGINT))
            AS side
        FROM pop
    ),
    cust AS (
        SELECT c_custkey AS ck,
               (c_custkey * 48271 + 11) % (SELECT side FROM pl) AS px,
               (c_custkey * 69621 + 7) % (SELECT side FROM pl) AS py
        FROM {customer}
    ),
    supp AS (
        SELECT s_suppkey AS sk,
               (s_suppkey * 40503 + 3) % (SELECT side FROM pl) AS sx,
               (s_suppkey * 16807 + 5) % (SELECT side FROM pl) AS sy
        FROM {supplier}
    ),
    -- probe from the SUPPLIER side (~10x smaller than customer): the 9
    -- neighbor cells are expanded as a UNION ALL over literal offsets
    -- INSIDE one relation, so the cell condition below is a plain
    -- two-table equi-join. (A CROSS JOIN (VALUES -1,0,1) dx/dy lateral
    -- looked equivalent but let Spark's join reorder pull the VALUES
    -- crosses ABOVE the supplier-customer join, degrading it to a
    -- BroadcastNestedLoopJoin over all pairs — 30x wall at the x30
    -- stress. Plane side comes via a scalar subquery, which Spark's
    -- ReuseSubquery computes once across all branches.)
    probe AS (
        {probe_branches}
    ),
    hits AS (
        SELECT c.ck, s.sk,
               (c.px - s.sx) * (c.px - s.sx)
               + (c.py - s.sy) * (c.py - s.sy) AS d2
        FROM probe s
        JOIN cust c
          ON s.cx = CAST(FLOOR(c.px / {_CELL}.0) AS BIGINT)
         AND s.cy = CAST(FLOOR(c.py / {_CELL}.0) AS BIGINT)
        WHERE (c.px - s.sx) * (c.px - s.sx)
              + (c.py - s.sy) * (c.py - s.sy) <= {_R2}
    ),
    -- arg-min via a packed BIGINT (d2 * 2^32 + key): min(packed) ==
    -- lexicographic min(d2, key) while keys < 2^32, and d2 <= {_R2}
    -- keeps packed < 2^53 (exact in any engine). Hash aggregates with
    -- map-side partial combine replace two full window sorts over the
    -- candidate table — the windows were the scale bottleneck.
    c_best AS (
        SELECT ck, MIN(d2 * 4294967296 + sk) AS pk
        FROM hits GROUP BY ck
    ),
    s_best AS (
        SELECT sk, MIN(d2 * 4294967296 + ck) AS pk
        FROM hits GROUP BY sk
    )
    SELECT c.ck AS c_custkey,
           c.pk % 4294967296 AS s_suppkey,
           CAST(FLOOR(CAST(c.pk AS DOUBLE) / 4294967296.0) AS BIGINT)
               AS dist2_deci,
           ROUND(sqrt(FLOOR(CAST(c.pk AS DOUBLE) / 4294967296.0)) / 10.0, 6)
               AS dist_units
    FROM c_best c
    JOIN s_best s
      ON s.sk = c.pk % 4294967296
     AND s.pk % 4294967296 = c.ck
    """


@register("mutual_nn_matching", oracle=_mutual_nn_sql("customer", "supplier"))
def mutual_nn_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal nearest-neighbor (mutual-NN) 1:1 matching between
    customers and suppliers on the module's deterministic integer
    geometry: a pair matches only when each side is the other's nearest
    neighbor within the 9-cell search envelope — the greedy-safe,
    order-free assignment rule entity-resolution and cross-device
    matching pipelines use (a mutual-NN pair can never be contested, so
    no sequential greedy pass is needed; the match set is computable in
    parallel).

    Scale shape: ONE bucketed candidate join (cell-id equi-join, 9-cell
    probe) feeds BOTH direction's rank-1 picks — two windows over the
    same hits table, then a pair equi-join; no cross product, no
    sequential assignment loop. Exact BIGINT distances with key
    tiebreaks; the only double is the final sqrt on an exact integer."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "mnn_customer"
    )
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "mnn_supplier"
    )
    return spark.sql(_mutual_nn_sql("mnn_customer", "mnn_supplier"))
