package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The remaining TPC-H-shaped relational surface (SURVEY.md §2.4 breadth).
  *
  * The reference engine (gengstrand/map-reduce-sf-crime) exposes only
  * scan→group→sum pipelines; these queries complete the join/subquery/outer
  * shapes a general engine must plan well: conditional outer joins with
  * aggregation-of-aggregation (Q13), disjoint-nation pair analysis over
  * fact-fact joins (Q7/Q8/Q9), anti-join + scalar-threshold subqueries (Q22),
  * and max-equality join-back (Q15). partsupp does not exist in the TESTDATA
  * schema, so Q2/Q11/Q20 (the partsupp-only shapes) are out of scope; the
  * supplycost-dependent parts of Q9 are re-expressed over discount revenue.
  *
  * Numeric parity follows the Relational.scala rules: money is cast to
  * decimal BEFORE summation (exact, shuffle-order-independent), cast to
  * DOUBLE only at the output boundary; any division happens in double AFTER
  * the exact sums, rounded identically on both sides.
  */
object Tpch {

  /** `l_extendedprice * (1 - l_discount)` in exact decimal — the shared
    * revenue term (same construction as Relational.topUrgentOrders). */
  private def revDec(price: String = "l_extendedprice", disc: String = "l_discount") =
    (col(price).cast("decimal(12,2)")
      * (lit(1).cast("decimal(3,2)") - col(disc).cast("decimal(4,2)"))
        .cast("decimal(5,2)"))

  /** TPC-H Q6-shaped forecast-revenue-change: the pure scan-filter-aggregate.
    * Every predicate (year, discount band, quantity cap) pushes into the
    * parquet scan — the plan is one pruned scan plus a two-column partial/
    * final aggregate, zero joins, zero wide shuffles at any scale. */
  def forecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      // the year slice as a sargable range: year(col)=N never reaches
      // PushedFilters, a timestamp range prunes row groups at the scan
      .where(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(
        sum((col("l_extendedprice").cast("decimal(12,2)")
          * col("l_discount").cast("decimal(4,2)")))
          .cast("decimal(18,4)").cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q7-shaped volume shipping: revenue between DISTINCT nation pairs
    * (supplier nation ≠ customer nation) per ship year. Supplier and nation
    * broadcast (dim-sized); orders⋈customer and lineitem⋈orders shuffle on
    * their keys with partial aggregation map-side. */
  def volumeShipping(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame): DataFrame = {
    val suppNation = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNation = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ordersNation = orders
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    lineitem
      // sargable form of year IN (1996, 1997): pushes to the parquet scan
      .where(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1998-01-01"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"), revDec().as("rev"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(ordersNation, col("l_orderkey") === col("o_orderkey"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum("rev").cast("decimal(18,4)").cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8-shaped market share: for ECONOMY-type parts bought by
    * customers of one region, the share of revenue supplied by one nation,
    * per order year. The share division runs in double AFTER the exact
    * decimal sums, rounded to 6 on both sides. */
  def marketShare(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame, part: DataFrame,
      regionName: String = "ASIA", supplierNation: String = "NATION_2",
      partType: String = "ECONOMY"): DataFrame = {
    val regionNations = nation
      .join(broadcast(region.where(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val regionCust = customer
      .join(broadcast(regionNations), col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select("c_custkey")
    val suppNation = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val regionOrders = orders
      .where(col("o_orderdate") >= lit("1996-01-01") // sargable year pair
        && col("o_orderdate") < lit("1998-01-01"))
      .join(broadcast(regionCust), col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    lineitem
      .join(broadcast(part.where(col("p_type") === partType).select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_orderkey"), col("l_suppkey"), revDec().as("rev"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(regionOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === supplierNation, col("rev"))
          .otherwise(lit(0).cast("decimal(17,4)")))
          .cast("decimal(18,4)").cast("double").as("nation_revenue"),
        sum("rev").cast("decimal(18,4)").cast("double").as("total_revenue"))
      .select(col("o_year"),
        round(col("nation_revenue") / col("total_revenue"), 6).as("mkt_share"),
        col("nation_revenue"), col("total_revenue"))
      .orderBy("o_year")
  }

  /** TPC-H Q9-shaped profit by (supplier nation, year) over a part-name
    * slice; supplycost is not in TESTDATA, so profit is discount revenue.
    * part and supplier⋈nation broadcast; lineitem never shuffles before the
    * partial aggregate. */
  def profitByNation(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
      part: DataFrame, nameFragment: String = "red"): DataFrame = {
    val suppNation = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    lineitem
      .join(broadcast(part.where(col("p_name").contains(nameFragment))
        .select("p_partkey")), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_suppkey"), year(col("l_shipdate")).as("o_year"), revDec().as("rev"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy("n_name", "o_year")
      .agg(sum("rev").cast("decimal(18,4)").cast("double").as("profit"))
      .orderBy("n_name", "o_year")
  }

  /** TPC-H Q10-shaped returned-item report: top-20 customers by revenue lost
    * to returns in one quarter. Aggregate-first on the pruned fact columns,
    * then the per-customer attributes join onto the 20-row result side —
    * never the other way around. */
  def returnedItems(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame = {
    val quarterOrders = orders
      // 1996Q1 as a closed-open range: prunes at the scan, unlike
      // year() = 1996 AND quarter() = 1
      .where(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1996-04-01"))
      .select("o_orderkey", "o_custkey")
    val revPerCust = lineitem
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revDec().as("rev"))
      .join(quarterOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("rev").cast("decimal(18,4)").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(20)
    revPerCust
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
  }

  /** TPC-H Q13-shaped customer order-count distribution: conditional LEFT
    * OUTER join (the filter lives in the join condition, not a WHERE —
    * customers with zero qualifying orders must survive with count 0), then
    * aggregation of the aggregation. */
  def orderCountDistribution(customer: DataFrame, orders: DataFrame,
      excludedPriority: String = "1-URGENT"): DataFrame = {
    val perCust = customer
      .join(orders.where(col("o_orderpriority") =!= excludedPriority),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q15-shaped top supplier: revenue per supplier over one quarter,
    * keep the supplier(s) equal to the maximum. The max joins back as a
    * broadcast 1-row aggregate; equality is tested on the EXACT decimal sums
    * (never the double cast), so ties are bit-identical cross-engine. */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val rev = lineitem
      .where(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .select(col("l_suppkey"), revDec().as("rev"))
      .groupBy("l_suppkey")
      .agg(sum("rev").cast("decimal(18,4)").as("total_rev"))
    val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
    rev
      .join(broadcast(maxRev), col("total_rev") === col("max_rev"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q22-shaped idle-customer report: customers with above-average
    * account balance (among positive balances) and no orders since a cutoff
    * ("lapsed" — every TESTDATA customer has SOME order, so the original
    * no-orders-ever predicate would be vacuous), bucketed by a derived code
    * (custkey mod 7 stands in for the TPC-H phone country code — TESTDATA
    * has no phone column). The above-average threshold is an exact
    * integer-decimal cross-multiplication (bal·n > sum), never a float
    * average; the lapsed check is a left-anti join against the date-pruned
    * order keys. */
  def idleCustomers(customer: DataFrame, orders: DataFrame,
      lapsedSince: String = "2000-01-01"): DataFrame = {
    val bal = customer
      .select(col("c_custkey"), (col("c_custkey") % 7).as("cntrycode"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val stats = bal.where(col("bal") > 0)
      .agg(sum("bal").as("pos_sum"), count(lit(1)).as("pos_n"))
    bal
      .crossJoin(broadcast(stats))
      .where(col("bal") * col("pos_n") > col("pos_sum"))
      .join(orders.where(col("o_orderdate") >= lit(lapsedSince)).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("cntrycode")
      .agg(count(lit(1)).as("numcust"),
        sum("bal").cast("decimal(18,2)").cast("double").as("totacctbal"))
      .orderBy("cntrycode")
  }
}
