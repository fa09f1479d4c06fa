"""Star-schema analytical queries over the TPC-H-ish harness tables.

The reference has zero joins (SURVEY.md §2.7); these exercise the join
surface the engine gets from Spark, shaped the way they must be at
100 TB:

- dimension sides (region/nation/supplier/customer) are broadcast —
  no shuffle of the fact table for those joins;
- fact-fact joins (orders⋈lineitem) are equi-joins AQE can re-plan;
- every filter lands in the parquet scan (PushedFilters).

All money aggregates are rounded to 4dp and every output column is
explicitly aliased for oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_to_rag_spark.sources.tables import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (pure agg, the
    scan-throughput benchmark: 2-phase hash agg, 6 columns read)."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """TPC-H Q3-style: revenue of unshipped-ish orders for one market
    segment. customer is broadcast; orders⋈lineitem shuffles on
    orderkey once."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 4).alias("revenue"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
            F.col("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(k)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders with at least one late-shipped lineitem,
    counted per priority — a left-semi join (existence), which Spark
    executes without duplicating or materializing the probe side."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue per nation for one region, customer and
    supplier nation must match. region/nation/supplier/customer all
    broadcast — the only big shuffle is orders⋈lineitem."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            c,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 4).alias("revenue"))
    )


def top_suppliers(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Q15-style: revenue per supplier, top-k, joined to supplier dim
    (broadcast) after aggregation — aggregate-then-join keeps the
    broadcast side at k rows' worth of work, not pre-join fan-out."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        l.groupBy("l_suppkey")
        .agg(F.round(F.sum(revenue), 4).alias("total_revenue"))
    )
    return (
        agg.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
            F.col("total_revenue"),
        )
        .orderBy(F.desc("total_revenue"), F.asc("suppkey"))
        .limit(k)
    )


def segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer⋈orders per market segment: order count, avg/total price.
    customer is the broadcast side; one shuffle for the final agg."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
    )


def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈part (broadcast) per part type: volume + discounted
    revenue — the scan reads 3 lineitem columns only."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 4).alias("total_qty"),
            F.round(F.sum(revenue), 4).alias("revenue"),
        )
    )


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (status, priority) — grouping-set
    aggregation the reference lacks entirely; one shuffle, the rollup
    combinations are computed by expand + partial agg."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers that never ordered (NOT EXISTS). The
    orders side reduces to a distinct-key broadcast under AQE."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: shipping volume between supplier-nation and
    customer-nation pairs per year. Two different dimension chains
    hang off the same fact rows — both broadcast; the one shuffle is
    the orders⋈lineitem equi-join, then a 3-key aggregate."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.round(F.sum(revenue), 4).alias("volume"))
    )


def q2_min_cost_supplier(
    spark: SparkSession, sf_dir: str, size: int = 15, ptype: str = "STANDARD"
) -> DataFrame:
    """TPC-H Q2-style: cheapest supplier per part (correlated MIN
    subquery). The harness schema has no partsupp, so unit cost is
    derived as MIN(l_extendedprice / l_quantity) per (part, supplier)
    — MIN of exact element-wise doubles is order-independent, so the
    value is bit-identical across engines.

    Shape at scale: one shuffle on (partkey, suppkey) for the cost
    agg, then a min_by per part (second shuffle on partkey only);
    part and supplier dims broadcast onto the k-rows-per-part result.
    """
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == size) & (F.col("p_type") == ptype)
    )
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    unit_cost = F.col("l_extendedprice") / F.col("l_quantity")
    costs = (
        l.join(p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit_cost).alias("unit_cost"))
    )
    # cheapest supplier per part, ties broken on suppkey: min_by over a
    # struct orders lexicographically (cost, suppkey) — one agg, no window
    best = costs.groupBy("l_partkey").agg(
        F.min(F.struct(F.col("unit_cost"), F.col("l_suppkey"))).alias("b")
    ).select(
        F.col("l_partkey").alias("partkey"),
        F.col("b.unit_cost").alias("unit_cost"),
        F.col("b.l_suppkey").alias("suppkey"),
    )
    return (
        best.join(load_table(spark, sf_dir, "part"),
                  F.col("partkey") == F.col("p_partkey"))
        .join(s, F.col("suppkey") == F.col("s_suppkey"))
        .select(
            "partkey",
            F.col("p_name").alias("part_name"),
            "suppkey",
            F.col("s_name").alias("supplier_name"),
            F.col("s_acctbal").alias("supplier_acctbal"),
            "unit_cost",
        )
    )


def q8_market_share(
    spark: SparkSession, sf_dir: str, nation: str = "NATION_7",
    region: str = "ASIA", ptype: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q8-style: one supplier-nation's share of revenue for a
    part type sold into a customer region, per order year. All dims
    broadcast; the single fact shuffle is orders⋈lineitem; the final
    agg is 1 row per year (conditional-sum ratio)."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    n_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_nk"), F.col("n_regionkey").alias("cn_rk")
    )
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nk"), F.col("n_name").alias("supp_nation")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == ptype)
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n_cust, F.col("c_nationkey") == F.col("cn_nk"))
        .join(r, F.col("cn_rk") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n_supp, F.col("s_nationkey") == F.col("sn_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == nation, volume).otherwise(F.lit(0.0)))
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
    )


def q9_profit(spark: SparkSession, sf_dir: str, name_like: str = "%bolt%") -> DataFrame:
    """TPC-H Q9-style: profit per supplier nation per year for parts
    matching a name pattern. No partsupp in the harness schema, so
    supply cost is proxied as 10% of p_retailprice per unit (a
    deterministic expression both engines compute identically).
    part/supplier/nation broadcast; one orders⋈lineitem shuffle."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like(name_like))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(p.select("p_partkey", "p_retailprice"),
               F.col("l_partkey") == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(F.round(F.sum(profit), 4).alias("profit"))
    )


def q11_important_parts(
    spark: SparkSession, sf_dir: str, fraction: float = 0.001
) -> DataFrame:
    """TPC-H Q11-style: parts whose total sold value exceeds a fixed
    fraction of the global total (scalar-subquery HAVING). The global
    total is a 1-row aggregate cross-joined (broadcast) onto the
    per-part aggregate — no window-over-unpartitioned collapse."""
    l = load_table(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = l.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(value).alias("part_value")
    )
    total = per_part.agg(F.sum("part_value").alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * F.lit(fraction))
        .select("partkey", F.round("part_value", 4).alias("part_value"))
    )


def q12_late_shipments(
    spark: SparkSession, sf_dir: str, days: int = 60
) -> DataFrame:
    """TPC-H Q12-style (no l_shipmode in harness schema): per ship
    year, how many lineitems shipped more than `days` after the order
    date, split by high/low order priority — conditional aggregation
    over the one fact-fact join."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {days} DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: percentage of revenue from PROMO parts in one
    ship year — broadcast part join, single-row conditional ratio."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p.select("p_partkey", "p_type"),
               F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0)))
                / F.sum(revenue),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: supplier(s) with the maximum revenue over one
    quarter. The classic formulation is a view + scalar-max subquery;
    here the per-supplier revenue agg (one shuffle on l_suppkey over
    the filtered fact scan) produces a supplier-cardinality frame
    (SF×10k rows — tiny even at 100 TB), so the scalar max rides a
    single-partition window over that aggregate, not a second pass
    over lineitem. supplier dim is broadcast onto the winners."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("total_revenue"))
    )
    w = Window.partitionBy()
    return (
        revenue.withColumn("max_rev", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")),
              F.col("suppkey") == F.col("s_suppkey"))
        .select("suppkey", F.col("s_name").alias("supplier_name"), "total_revenue")
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct suppliers per (brand, type, size)
    for a part subset, excluding one brand. Supplier-part pairs come
    from lineitem (no partsupp in harness schema). distinct before
    the count is a two-level shuffle Spark plans as partial distinct."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
    )


def q18_large_orders(
    spark: SparkSession, sf_dir: str, min_qty: float = 250.0, k: int = 100
) -> DataFrame:
    """TPC-H Q18-style: orders whose total quantity exceeds a
    threshold, with customer info. Aggregate lineitem FIRST (HAVING
    prunes to a tiny set), then broadcast-join orders/customer onto
    it — never join before reducing."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_name").alias("customer_name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 4).alias("totalprice"),
            F.round("total_qty", 4).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(k)
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: revenue under three disjunctive brand/size/
    quantity branches — one broadcast join, the OR-of-ANDs stays a
    single codegen'd predicate (no union of three scans)."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(1, 15))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 20))
            & (F.col("l_quantity").between(10, 25))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 30))
            & (F.col("l_quantity").between(20, 35))
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p.select("p_partkey", "p_brand", "p_size"),
               F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(F.round(F.sum(revenue), 4).alias("revenue"))
    )


def q22_inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: customers with above-average (positive)
    account balance and no orders, counted per nation. Scalar-subquery
    threshold broadcast onto the scan; NOT EXISTS as left-anti."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: distribution of customers by order count,
    including zero-order customers — a right-outer-shaped join
    expressed as customer LEFT JOIN orders, then two stacked
    aggregations (per-customer count, then histogram). The second agg
    input is one row per customer, so the heavy shuffle happens once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q20_bulk_part_suppliers(
    spark: SparkSession, sf_dir: str, name_like: str = "%widget%",
    year: int = 1997, min_qty: float = 100.0,
) -> DataFrame:
    """TPC-H Q20-style: suppliers who shipped a meaningful volume of a
    part family in one year (no partsupp in harness schema, so the
    availability threshold becomes a shipped-quantity HAVING). Shape:
    part filter broadcast into lineitem, one agg on suppkey, then the
    supplier dim LEFT SEMI against the tiny qualifying-key set —
    supplier rows never fan out.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like(name_like))
    l = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == year)
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    qualifying = (
        l.join(p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > min_qty)
    )
    return (
        s.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("nation"),
        )
    )


def q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str, brand: str = "Brand#12"
) -> DataFrame:
    """TPC-H Q17-style: yearly revenue lost if small orders (quantity
    below 20% of the part's average) were not taken. The correlated
    per-part AVG becomes one aggregate joined back to the fact rows;
    quantities are integral doubles, so avg = exact-sum / count is
    bit-identical across engines and the 0.2× threshold compare
    cannot drift."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
    l = load_table(spark, sf_dir, "lineitem")
    lp = l.join(p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = lp.groupBy(F.col("l_partkey").alias("ap")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        lp.join(avg_qty, F.col("l_partkey") == F.col("ap"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_orders"),
        )
    )


def q21_sole_late_suppliers(
    spark: SparkSession, sf_dir: str, days: int = 90, k: int = 20
) -> DataFrame:
    """TPC-H Q21-style: suppliers who were the ONLY late supplier on a
    multi-supplier order (late = shipped > `days` after order date;
    the harness schema has no receipt/commit dates). One pass
    computes per-(order, supplier) late flags, then per-order counts
    decide both EXISTS conditions — no triple self-join of lineitem:
    the reference formulation's correlated EXISTS/NOT EXISTS collapse
    into a count-based HAVING on an aggregate Spark executes with one
    shuffle of (orderkey, suppkey) rows."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {days} DAYS")
    ).cast("long")
    # per_os feeds BOTH the per-order rollup and the sole-late filter.
    # Instead of materializing it (localCheckpoint) and self-joining
    # against the per-order counts, compute the counts as window
    # aggregates over the same l_orderkey partitioning: one branch,
    # no checkpoint, no join — and the window's exchange reuses the
    # aggregation's shuffle layout (measured 1.26s -> 0.99s at sf0.1,
    # aggregate-identical output).
    per_os = (
        l.join(o.select("o_orderkey", "o_orderdate"),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("was_late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_os.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n_suppliers"),
        F.sum("was_late").over(w).alias("n_late"),
    )
    sole_late = (
        flagged.filter(
            (F.col("was_late") == 1)
            & (F.col("n_suppliers") > 1)
            & (F.col("n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        sole_late.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
            "numwait",
        )
        .orderBy(F.desc("numwait"), F.asc("suppkey"))
        .limit(k)
    )
