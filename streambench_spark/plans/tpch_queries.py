"""TPC-H-style batch analytics over the star-schema testdata tables —
the relational/OLAP breadth of the engine (scan → filter → multi-way
join → grouped aggregate → top-k), complementing the streaming suite.

Shapes follow the public TPC-H queries (Q1/Q3/Q5/Q6/Q10), adapted to the
driver's slimmed schema. Monetary aggregates are summed as integer cents
(round(expr·100) per row, then a long sum) so results are bit-exact under
any partitioning/aggregation order — the float expression inside the
round is written with identical association on both engines.

Scale posture per query is noted in each docstring; the common rules:
fact-side scans keep filters/projections at the parquet scan, dims are
broadcast (region/nation/supplier/customer at any realistic scale factor
stay dim-sized), and the only fact shuffles are the grouped aggregates
on the query's group-by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streambench_spark.catalog import load_table
from streambench_spark.plans.queries import register


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("long")


@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS sum_qty_cents,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_base_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS BIGINT) AS sum_disc_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
               AS BIGINT)) AS BIGINT) AS sum_charge_cents,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: one fact scan (filter at the scan) + one grouped aggregate on a
    4-ish-cardinality key — map-side partials reduce the shuffle to a few
    rows per partition regardless of fact size."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_cents"),
        F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
        F.sum(_cents(disc)).alias("sum_disc_cents"),
        F.sum(_cents(disc * (1 + F.col("l_tax")))).alias("sum_charge_cents"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey AS l_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
               AS BIGINT)) AS BIGINT) AS revenue_cents,
           epoch_ms(o.o_orderdate) AS o_orderdate_ms
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY 1, 3
    ORDER BY revenue_cents DESC, l_orderkey ASC
    LIMIT 10
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: dims (customer, filtered orders) broadcast onto the lineitem
    fact; one grouped aggregate on orderkey; TakeOrderedAndProject for the
    top 10 (per-partition heaps, no global sort)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    joined = li.join(
        F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        joined.groupBy(
            "l_orderkey",
            # o_orderdate is TIMESTAMP_NTZ; cast to ltz (session tz = UTC,
            # so the instant is unchanged) for unix_millis
            F.unix_millis(F.col("o_orderdate").cast("timestamp"))
            .alias("o_orderdate_ms"),
        )
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_cents")
        )
        .select("l_orderkey", "revenue_cents", "o_orderdate_ms")
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier",
    """
    SELECT n.n_name AS n_name,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
               AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: six-way join — every dim side broadcast, so the lineitem fact
    is never shuffled until the final small groupBy(nation)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .alias("revenue_cents")
    )


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
               AS BIGINT) AS revenue_cents,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure scan-filter-aggregate; all four predicates reach the
    parquet scan (PushedFilters) and only 4 columns are read."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount")))
            .alias("revenue_cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
               AS BIGINT)) AS BIGINT) AS revenue_cents,
           n.n_name AS n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY 1, 2, 4
    ORDER BY revenue_cents DESC, c_custkey ASC
    LIMIT 20
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: returned-items revenue per customer, top 20 — broadcast dims,
    single fact aggregate, heap-based top-k."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_cents")
        )
        .select("c_custkey", "c_name", "revenue_cents", "n_name")
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY 1
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (order-priority checking, adapted to the slimmed schema: the
    EXISTS condition is l_shipdate > o_orderdate since commit/receipt
    dates aren't shipped): date-windowed orders LEFT SEMI joined to
    lineitem — the semi join dedups matches engine-side, no distinct
    needed; the extra non-equi conjunct rides the hash join as a residual
    filter. Fact shuffle only at the tiny priority group-by."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "tpch_q14_promo_revenue",
    """
    WITH j AS (
        SELECT CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                   AS cents,
               p_type
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate <  TIMESTAMP '1997-10-01'
    )
    SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN cents ELSE 0 END)
               AS BIGINT) AS promo_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN cents
                                       ELSE 0 END) AS DOUBLE)
                 / CAST(sum(cents) AS DOUBLE), 6) AS promo_pct
    FROM j
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 (promotion effect): month-windowed lineitem broadcast-joined
    to part (dim side), conditional aggregation (CASE inside sum) — one
    global aggregate, no group-by shuffle of the fact. The percentage is
    derived from two exact integer-cent sums (both emitted), so the
    float division is one identical IEEE op on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("cents"),
        "p_type",
    )
    promo = F.sum(
        F.when(F.col("p_type").startswith("PROMO"), F.col("cents")).otherwise(0)
    )
    return j.agg(
        promo.alias("promo_cents"),
        F.sum("cents").alias("total_cents"),
        F.round(
            100.0 * promo.cast("double") / F.sum("cents").cast("double"), 6
        ).alias("promo_pct"),
    )


@register(
    "tpch_q18_large_volume",
    """
    WITH big AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_cents
        FROM lineitem GROUP BY 1
        HAVING sum_qty_cents > 25000
    )
    SELECT c.c_custkey, o.o_orderkey, epoch_ms(o.o_orderdate) AS o_orderdate_ms,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
           b.sum_qty_cents
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 (large-volume customers): grouped HAVING filter on the fact
    (one shuffle on l_orderkey, map-side partials), then the SMALL
    surviving set drives broadcast joins to orders and customer — the
    aggregate-then-join ordering keeps both joins off the raw fact."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_cents"))
        .filter(F.col("sum_qty_cents") > 25000)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_ms"
            ),
            _cents(F.col("o_totalprice")).alias("total_cents"),
            "sum_qty_cents",
        )
    )


@register(
    "tpch_q19_discounted_revenue",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
               AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 (discounted revenue, adapted: shipmode/shipinstruct aren't in
    the slimmed schema): disjunctive mixed fact/dim predicates — the
    equi-join on partkey stays a broadcast hash join and the OR-of-ANDs
    rides it as a residual filter; Catalyst additionally pushes the
    derivable single-side disjunctions (brand/size to part's scan,
    quantity range to lineitem's) below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue_cents"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY 1
    )
    GROUP BY 1
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 (customer order distribution): LEFT OUTER join so zero-order
    customers survive as null rows, count(o_orderkey) skipping nulls,
    then a second tiny aggregate over the counts. The outer join shuffles
    both sides on the key once; the histogram aggregate is
    counts-of-counts-sized."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q17_small_quantity_revenue",
    """
    WITH pa AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qc,
               count(*) AS n
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           count(*) AS n_items
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE CAST(round(l.l_quantity * 100) AS BIGINT) * 5 * pa.n < pa.sum_qc
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 (small-quantity-order revenue): the classic correlated scalar
    subquery (quantity < 20% of the part's average) decorrelated into an
    aggregate-then-join, with the float average comparison rewritten as
    an INTEGER inequality (qty_cents * 5 * n < sum_qty_cents ⇔
    qty < avg/5) so both engines agree bit-for-bit. The per-part
    aggregate output is parts-sized — small enough that AQE converts
    the join to broadcast at bench SFs, while at 100 TB (billions of
    parts) it correctly falls back to a sort-merge join that REUSES the
    aggregate's hash-on-partkey partitioning; no explicit hint, the
    planner picks by stats."""
    li = load_table(spark, sf_dir, "lineitem")
    qc = _cents(F.col("l_quantity"))
    pa = li.groupBy("l_partkey").agg(
        F.sum(qc).alias("sum_qc"), F.count(F.lit(1)).alias("n")
    )
    l = li.select(
        F.col("l_partkey").alias("lp"), qc.alias("qty_cents"),
        _cents(F.col("l_extendedprice")).alias("price_cents"),
    )
    return (
        l.join(pa, l["lp"] == pa["l_partkey"])
        .filter(F.col("qty_cents") * 5 * F.col("n") < F.col("sum_qc"))
        .agg(
            F.sum("price_cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
