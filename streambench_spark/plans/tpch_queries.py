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
    """Q3: the customer dim broadcasts; the date-filtered orders side is
    SF-PROPORTIONAL (~45% of orders), so it carries NO broadcast hint —
    AQE broadcasts it while it fits and falls back to sort-merge at
    scale, instead of a forced hint dying on the broadcast cap. One
    grouped aggregate on orderkey; TakeOrderedAndProject for the top 10
    (per-partition heaps, no global sort)."""
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
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
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
    """Q5: six-way join — the true dims (customer, supplier, nation,
    region) broadcast; the two-year orders slice is SF-proportional so
    it is left unhinted for AQE to decide (broadcast while small,
    sort-merge at scale). The lineitem fact still never shuffles before
    the final small groupBy(nation) when orders broadcasts."""
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
        li.join(o, li.l_orderkey == o.o_orderkey)
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
    """Q10: returned-items revenue per customer, top 20 — true dims
    broadcast, the one-year orders slice unhinted (SF-proportional: AQE
    broadcasts while it fits), single fact aggregate, heap-based
    top-k."""
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
        li.join(o, li.l_orderkey == o.o_orderkey)
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
    total = F.sum("cents")
    # An all-zero-revenue month (every cents row 0: zero prices or 100%
    # discounts) zeroes the denominator; cents >= 0 on the supported
    # domain (price >= 0, discount <= 1), so the promo numerator is
    # provably 0 there too and the guard only swaps an ANSI
    # DIVIDE_BY_ZERO crash for the oracle's 0/0 NULL (the r13
    # fixture-fuzz class, swept through the TPC-H family in r14).
    return j.agg(
        promo.alias("promo_cents"),
        total.alias("total_cents"),
        F.when(
            total != 0,
            F.round(100.0 * promo.cast("double") / total.cast("double"), 6),
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


@register(
    "tpch_q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
               AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 (volume shipping between two nations): supplier+nation and
    customer+nation are broadcast dims; the date+nation filters make both
    fact sides selective (2/25 of suppliers resp. customers) BEFORE the
    lineitem-orders equi join, which is left unhinted so AQE picks
    broadcast at bench SFs and sort-merge at 100 TB. The OR-of-pairs
    predicate rides after both nation columns are attached."""
    nations = ("NATION_1", "NATION_2")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*nations)
    ).select("n_nationkey", "n_name")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select("o_orderkey", "cust_nation")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("l_orderkey", "l_extendedprice", "l_discount",
                "l_shipdate", "supp_nation")
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        ((F.col("supp_nation") == nations[0]) & (F.col("cust_nation") == nations[1]))
        | ((F.col("supp_nation") == nations[1]) & (F.col("cust_nation") == nations[0]))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").alias("l_year"),
    ).agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .alias("revenue_cents")
    )


@register(
    "tpch_q8_market_share",
    """
    WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                   AS BIGINT) AS cents,
               n2.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN cents ELSE 0 END)
               AS BIGINT) AS nation_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN cents ELSE 0 END)
                     AS DOUBLE)
                 / CAST(sum(cents) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY 1
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 (national market share): all five dims (part filtered on type,
    supplier+nation, customer+nation+region) broadcast onto the lineitem
    fact; lineitem-orders is the only fact-fact join (unhinted, AQE).
    The share is one IEEE division of two exact integer-cent sums,
    rounded to 6dp — bit-identical on both engines."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_nations = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_nationkey")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(cust_nations),
              F.col("c_nationkey") == cust_nations.n_nationkey)
        .select("c_custkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("l_orderkey", "l_extendedprice", "l_discount", "supp_nation")
    )
    vol = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.year("o_orderdate").alias("o_year"),
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("cents"),
        "supp_nation",
    )
    nation_sum = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", F.col("cents")).otherwise(0)
    )
    total = F.sum("cents")
    # A zero-revenue year group (all cents 0) zeroes the denominator;
    # cents >= 0 on the supported domain, so the nation numerator is
    # provably 0 there and the guard reproduces the oracle's 0/0 NULL
    # instead of the ANSI DIVIDE_BY_ZERO crash (r13 fixture-fuzz class).
    return vol.groupBy("o_year").agg(
        nation_sum.alias("nation_cents"),
        total.alias("total_cents"),
        F.when(
            total != 0,
            F.round(nation_sum.cast("double") / total.cast("double"), 6),
        ).alias("mkt_share"),
    )


@register(
    "tpch_q9_product_type_profit",
    """
    SELECT n.n_name AS n_name, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
               AS BIGINT)) AS BIGINT) AS profit_cents
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY 1, 2
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 (product-type profit, adapted: no partsupp table in the driver
    schema, so profit omits the ps_supplycost term): part (name-filtered)
    and supplier+nation broadcast onto lineitem; lineitem-orders unhinted
    (orders contributes only orderkey + year). Grouped on
    (nation, year) — 25×7 groups, map-side partials collapse the
    shuffle."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    ).select("p_partkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("l_orderkey", "l_extendedprice", "l_discount", "n_name")
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    return joined.groupBy(
        "n_name", F.year("o_orderdate").alias("o_year")
    ).agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .alias("profit_cents")
    )


@register(
    "tpch_q15_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                   AS BIGINT)) AS BIGINT) AS total_revenue_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 (top supplier): the view-plus-scalar-subquery shape — one
    quarter's revenue per supplier (single fact shuffle on suppkey,
    integer cents so the max is exact and tie-stable), the 1-row global
    max cross-broadcast back as a filter, survivors broadcast into the
    supplier dim join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .alias("total_revenue_cents")
    )
    mx = rev.agg(F.max("total_revenue_cents").alias("mx"))
    top = rev.join(
        F.broadcast(mx), rev.total_revenue_cents == F.col("mx")
    ).select("l_suppkey", "total_revenue_cents")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(F.broadcast(top), s.s_suppkey == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_cents")
    )


@register(
    "tpch_q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
    GROUP BY 1, 2, 3
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 (parts/supplier relationship, adapted: lineitem is the
    part-supplier bridge since partsupp isn't shipped): negated + IN-list
    dim predicates cut part to ~1/7 before the broadcast join; the
    count-distinct expands to Spark's two-phase plan (partial distinct on
    (group, suppkey), then final count) — both shuffles carry only
    distinct pairs, not raw fact rows."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q21_waiting_supplier",
    """
    WITH l1 AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_returnflag = 'R' AND o.o_orderstatus = 'F'
    )
    SELECT s.s_name, count(*) AS numwait
    FROM l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY 1
    ORDER BY numwait DESC, s_name ASC
    LIMIT 20
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 (suppliers who kept orders waiting, adapted: the
    commit/receipt-date lateness test becomes the returnflag='R' mark):
    the classic EXISTS + NOT-EXISTS pair — a left-semi then a left-anti
    self-join of lineitem on orderkey with a suppkey<>suppkey residual.
    All three lineitem legs shuffle on l_orderkey, so AQE/exchange reuse
    co-locates them; the final groupBy(supplier) is dim-cardinality and
    the top-20 is a TakeOrderedAndProject heap, no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    waited = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.ok2) & (l1.l_suppkey != l2.sk2),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3.ok3) & (F.col("l_suppkey") != l3.sk3),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waited.join(F.broadcast(s), waited.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "tpch_q22_global_sales_opportunity",
    """
    WITH pool AS (
        SELECT c_custkey, c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ),
    avg_pos AS (
        SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
               count(*) AS n
        FROM pool WHERE bal_cents > 0
    )
    SELECT p.c_nationkey AS cntrycode, count(*) AS numcust,
           CAST(sum(p.bal_cents) AS BIGINT) AS totacctbal_cents
    FROM pool p, avg_pos a
    WHERE p.bal_cents * a.n > a.sum_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = p.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY 1
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 (global sales opportunity, adapted: nationkey stands in for
    the phone country code the driver schema doesn't ship): the
    above-average-balance test is decorrelated into a 1-row
    (sum, count) broadcast and rewritten as the INTEGER inequality
    bal_cents · n > sum_cents (⇔ bal > avg) so no float average ever
    compares; customers-without-recent-orders (the original's "no orders
    for 7 years") is a left-anti join against date-filtered orders on
    custkey — the date filter reaches orders' scan and the single
    projected column keeps the anti join's shuffle narrow."""
    pool = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    ).select(
        "c_custkey", "c_nationkey", _cents(F.col("c_acctbal")).alias("bal_cents")
    )
    avg_pos = pool.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("sum_cents"), F.count(F.lit(1)).alias("n")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = pool.join(F.broadcast(avg_pos)).filter(
        F.col("bal_cents") * F.col("n") > F.col("sum_cents")
    )
    no_orders = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return no_orders.groupBy(
        F.col("c_nationkey").alias("cntrycode")
    ).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("bal_cents").alias("totacctbal_cents"),
    )


# ---------------------------------------------------------------------------
# Derived partsupp bridge — unlocks Q2 / Q11 / Q20
# ---------------------------------------------------------------------------
#
# The driver testdata ships no partsupp table, so the bridge is DERIVED
# deterministically from part × supplier with the public TPC-H dbgen
# assignment (4 suppliers per part, suppkey_i = (partkey + i*(S/4 +
# partkey/S)) mod S — dbgen's PART_SUPP_BRIDGE, adapted to the driver's
# 0-based keys). availqty/supplycost are integer functions of
# (partkey, suppkey) only, so the occasional step-degenerate collision at
# tiny SF (S=10: step ≡ 0 mod S for some partkey ranges) yields full-row
# duplicates that a DISTINCT removes — the bridge always has a clean
# (partkey, suppkey) primary key. Both engines build it from the same
# closed-form integer math: bit-exact, no data shipped.
#
# Scale posture: |partsupp| = 4·|part| — dim-scale (part is ~1/30th of
# lineitem rows at any TPC-H SF), so the bridge broadcasts or shuffles
# cheaply; it never touches the fact table.

_PARTSUPP_CTE = """
    scnt AS (SELECT count(*) AS s FROM supplier),
    ps_keys AS (
        SELECT DISTINCT
            p.p_partkey AS ps_partkey,
            (p.p_partkey + i.i * (scnt.s // 4 + p.p_partkey // scnt.s)) % scnt.s
                AS ps_suppkey
        FROM part p
        CROSS JOIN scnt
        CROSS JOIN (SELECT unnest(range(4)) AS i) i
    ),
    partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               (ps_partkey * 7 + ps_suppkey * 13) % 9999 + 1 AS ps_availqty,
               (ps_partkey * 31 + ps_suppkey * 17) % 100000 + 100
                   AS ps_supplycost_cents
        FROM ps_keys
    )
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _PARTSUPP_CTE (same integer math, same DISTINCT)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    scnt = load_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("s")
    )
    keys = (
        part.crossJoin(F.broadcast(scnt))
        .select(
            "p_partkey", "s",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            # s == 0 (empty supplier table) must yield a NULL suppkey —
            # DuckDB's `DIV 0`/`% 0` return NULL, while unguarded Spark
            # ANSI raises DIVIDE_BY_ZERO. AQE's empty-relation
            # propagation usually skips this stage when the downstream
            # supplier join is empty, but that is a plan accident, not a
            # guarantee (it vanishes when AQE is off — invariance axis).
            F.when(
                F.col("s") != 0,
                (F.col("p_partkey")
                 + F.col("i") * (F.expr("s DIV 4") + F.expr("p_partkey DIV s")))
                % F.col("s"),
            ).alias("ps_suppkey"),
        )
        .distinct()
    )
    return keys.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 9999 + 1)
        .alias("ps_availqty"),
        ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 100000 + 100)
        .alias("ps_supplycost_cents"),
    )


@register(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH {_PARTSUPP_CTE},
    eur AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    costs AS (
        SELECT ps.ps_partkey, ps.ps_supplycost_cents,
               e.s_name, e.s_acctbal, e.n_name,
               min(ps.ps_supplycost_cents)
                   OVER (PARTITION BY ps.ps_partkey) AS min_cost
        FROM partsupp ps JOIN eur e ON e.s_suppkey = ps.ps_suppkey
    )
    SELECT c.s_acctbal AS s_acctbal, c.s_name AS s_name,
           c.n_name AS n_name, c.ps_partkey AS p_partkey,
           CAST(c.ps_supplycost_cents AS BIGINT) AS cost_cents
    FROM costs c
    JOIN part p ON p.p_partkey = c.ps_partkey
    WHERE p.p_size >= 25 AND p.p_type = 'STANDARD'
      AND c.ps_supplycost_cents = c.min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 (minimum-cost supplier, adapted: derived partsupp; equality on
    p_type since the slimmed p_type has no trailing word): the correlated
    min-cost subquery is decorrelated into a window min over ps_partkey —
    ONE shuffle of the dim-scale bridge; region-filtered suppliers and
    the size/type-filtered part list both broadcast. LIMIT rides a total
    order ((partkey, suppkey) is unique per row) so the top-100 is
    deterministic — TakeOrderedAndProject, per-partition heaps."""
    from pyspark.sql.window import Window

    eur = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").join(
                    F.broadcast(
                        load_table(spark, sf_dir, "region").filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(eur), F.col("ps_suppkey") == F.col("s_suppkey"))
        .withColumn(
            "min_cost",
            F.min("ps_supplycost_cents").over(Window.partitionBy("ps_partkey")),
        )
    )
    pf = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") >= 25) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey")
    out = (
        costs.filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
        .join(F.broadcast(pf), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            F.col("ps_supplycost_cents").alias("cost_cents"),
        )
    )
    return out.orderBy(
        F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
    ).limit(100)


@register(
    "tpch_q11_important_stock",
    f"""
    WITH {_PARTSUPP_CTE},
    asia AS (
        SELECT s.s_suppkey
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
    ),
    vals AS (
        SELECT ps.ps_partkey,
               sum(ps.ps_supplycost_cents * ps.ps_availqty) AS value_cents
        FROM partsupp ps JOIN asia a ON a.s_suppkey = ps.ps_suppkey
        GROUP BY 1
    )
    SELECT ps_partkey, CAST(value_cents AS BIGINT) AS value_cents
    FROM vals
    WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM vals)
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 (important stock, adapted: region ASIA stands in for the
    GERMANY nation filter so the tiny SFs keep a non-degenerate supplier
    set; threshold fraction 0.001): per-part inventory value from the
    derived bridge, kept as INTEGER cents·qty so the 'value > fraction ·
    total' test is the exact inequality value·1000 > total — no float
    average ever compares. The total is a 1-row aggregate broadcast back
    (decorrelated scalar subquery); one shuffle on ps_partkey."""
    asia = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").join(
                    F.broadcast(
                        load_table(spark, sf_dir, "region").filter(
                            F.col("r_name") == "ASIA"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    vals = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(asia), F.col("ps_suppkey") == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty"))
            .alias("value_cents")
        )
    )
    total = vals.agg(F.sum("value_cents").alias("_total"))
    return (
        vals.join(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("_total"))
        .select("ps_partkey", "value_cents")
    )


@register(
    "tpch_q20_potential_promotion",
    f"""
    WITH {_PARTSUPP_CTE},
    small_ps AS (
        SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_availqty
        FROM partsupp ps
        JOIN part p ON p.p_partkey = ps.ps_partkey
        WHERE p.p_name LIKE 'small%'
    ),
    shipped AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS qty_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'
        GROUP BY 1, 2
    ),
    qual AS (
        SELECT DISTINCT sp.ps_suppkey
        FROM small_ps sp
        LEFT JOIN shipped sh
          ON sh.l_partkey = sp.ps_partkey AND sh.l_suppkey = sp.ps_suppkey
        WHERE sp.ps_availqty * 200 > coalesce(sh.qty_cents, 0)
    )
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    JOIN qual q ON q.ps_suppkey = s.s_suppkey
    WHERE r.r_name = 'EUROPE'
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 (potential part promotion, adapted: derived partsupp; region
    EUROPE for the nation filter; suppliers with NO 1998 shipments of a
    part count as over-stocked — both engines coalesce the missing group
    to 0): availqty > 0.5·shipped-qty is the integer inequality
    availqty·200 > qty_cents. The only fact-table touch is the
    date-filtered (l_partkey, l_suppkey) aggregate — filter at the scan,
    one fact shuffle on the composite key; the bridge joins it broadcast
    and the DISTINCT collapses to supplier grain before the dim joins."""
    sp = (
        _partsupp(spark, sf_dir)
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part")
                .filter(F.col("p_name").like("small%"))
                .select("p_partkey")
            ),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .select("ps_partkey", "ps_suppkey", "ps_availqty")
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("qty_cents"))
    )
    qual = (
        sp.join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
            "left",
        )
        .filter(
            F.col("ps_availqty") * 200 > F.coalesce(F.col("qty_cents"), F.lit(0))
        )
        .select("ps_suppkey")
        .distinct()
    )
    eur = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").join(
                    F.broadcast(
                        load_table(spark, sf_dir, "region").filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return eur.join(
        F.broadcast(qual), F.col("s_suppkey") == F.col("ps_suppkey")
    ).select("s_suppkey", "s_name")


@register(
    "tpch_q12_shipping_modes",
    """
    WITH li AS (
        SELECT l.l_shipdate, o.o_orderpriority,
               ['MAIL','SHIP','AIR','TRUCK','RAIL']
                   [(l.l_orderkey + l.l_linenumber) % 5 + 1] AS l_shipmode,
               CAST(o.o_orderdate AS DATE)
                   + CAST((l.l_orderkey * 3 + l.l_linenumber * 7) % 60 + 30 AS INT)
                   AS l_commitdate,
               CAST(l.l_shipdate AS DATE)
                   + CAST((l.l_orderkey + l.l_linenumber * 3) % 30 + 1 AS INT)
                   AS l_receiptdate
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT l_shipmode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM li
    WHERE l_shipmode IN ('MAIL', 'SHIP')
      AND l_commitdate < l_receiptdate
      AND CAST(l_shipdate AS DATE) < l_commitdate
      AND l_receiptdate >= DATE '1998-01-01'
      AND l_receiptdate < DATE '1999-01-01'
    GROUP BY 1
    """,
    tags=["tpch", "batch"],
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 (shipping modes & order priority, adapted: the driver schema
    ships no l_shipmode/l_commitdate/l_receiptdate, so they are DERIVED
    as closed-form integer functions of the row keys — same precedent as
    the partsupp bridge; both engines compute identical dates/modes).
    Late-shipment semantics preserved: commit < receipt (late), shipped
    before commit, receipt in 1998, MAIL/SHIP only, high/low priority
    line counts.

    Scale: the one fact-fact edge (lineitem⋈orders on orderkey) is left
    unhinted — AQE broadcasts the date-filtered survivor side when small
    and falls back to SMJ sharing the orderkey partitioning otherwise;
    derived columns are a narrow map evaluated BEFORE the 2-group
    aggregate, whose map-side partials collapse the shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    modes = F.expr(
        "array('MAIL','SHIP','AIR','TRUCK','RAIL')"
        "[CAST((l_orderkey + l_linenumber) % 5 AS INT)]"
    )
    commit = F.expr(
        "date_add(CAST(o_orderdate AS DATE), "
        "CAST((l_orderkey * 3 + l_linenumber * 7) % 60 + 30 AS INT))"
    )
    receipt = F.expr(
        "date_add(CAST(l_shipdate AS DATE), "
        "CAST((l_orderkey + l_linenumber * 3) % 30 + 1 AS INT))"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    out = (
        j.withColumn("l_shipmode", modes)
        .withColumn("l_commitdate", commit)
        .withColumn("l_receiptdate", receipt)
        .filter(
            F.col("l_shipmode").isin("MAIL", "SHIP")
            & (F.col("l_commitdate") < F.col("l_receiptdate"))
            & (F.col("l_shipdate").cast("date") < F.col("l_commitdate"))
            & (F.col("l_receiptdate") >= F.lit("1998-01-01").cast("date"))
            & (F.col("l_receiptdate") < F.lit("1999-01-01").cast("date"))
        )
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )
    return out
