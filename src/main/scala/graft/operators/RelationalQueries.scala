package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator inventory (SURVEY.md §2.2-§2.8) re-expressed as
  * idiomatic DataFrame pipelines over the TPC-H-ish test tables.
  *
  * Determinism rules applied throughout so the DuckDB oracle hash-matches:
  *   - money aggregates go through DECIMAL casts (exact, engine-independent);
  *   - double aggregates are rounded to 4 decimals;
  *   - every result carries a total ORDER BY with a unique tie-break key;
  *   - every computed column is aliased identically on both sides.
  */
object RelationalQueries {

  private def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Final-output discipline: aggregates run in EXACT decimal arithmetic
    * (order-independent, engine-independent) but the *emitted* column is
    * cast to DOUBLE. Reason: the driver compares our parquet against a
    * DuckDB dataframe, and DuckDB surfaces DECIMAL results as float64 —
    * emitting decimal128 on our side risks a physical-type/format
    * mismatch on identical values. The decimal→double conversion of one
    * exact sum is deterministic on both engines (well under 2^53).
    */

  /** Deterministic cross-engine average: the inputs are 2-decimal
    * doubles, so sum(DECIMAL(18,2)) is EXACT and identical in Spark and
    * DuckDB regardless of partition/accumulation order; dividing that
    * one exact value as a double and rounding is then reproducible.
    * (A bare round(avg(double),4) is not: float sums are order-dependent.)
    */
  private def avg4(c: org.apache.spark.sql.Column) =
    round(sum(dec2(c)).cast("double") / count(lit(1)), 4)
  private def avg4Sql(col: String) =
    s"round(CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4)"

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------
    // A1/A6/A7 grouped aggregation with decimal + filtered aggregates
    // (TPC-H Q1 shape; reference A-family, SURVEY §2.4)
    Q("q1_pricing_summary",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        // All money/rate inputs are 2-decimal doubles (verified on the
        // test data), so DECIMAL(18,2) casts are tie-free and the whole
        // aggregate is exact integer(-cent) arithmetic on both engines.
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount")))
              * (lit(1).cast(DecimalType(18, 2)) + dec2(col("l_tax"))))
              .cast("double").as("sum_charge"),
            avg4(col("l_quantity")).as("avg_qty"),
            avg4(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
             ${avg4Sql("l_quantity")} AS avg_qty,
             ${avg4Sql("l_discount")} AS avg_disc,
             count(*) AS count_order
             FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus""")),

    // ----------------------------------------------------------------
    // J1-shape multi-join + agg + top-k (TPC-H Q3); broadcast dim side
    Q("q3_shipping_priority",
      (s, d) => {
        val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
            .cast("double").as("revenue"))
          .select(col("o_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("o_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT o_orderkey, revenue, o_orderdate, o_orderpriority FROM (
             SELECT o_orderkey,
                    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                    o_orderdate, o_orderpriority
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                           JOIN customer ON o_custkey = c_custkey
             WHERE c_mktsegment = 'BUILDING'
               AND o_orderdate < TIMESTAMP '1998-01-01'
               AND l_shipdate > TIMESTAMP '1998-01-01'
             GROUP BY o_orderkey, o_orderdate, o_orderpriority)
             ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""")),

    // ----------------------------------------------------------------
    // 5-way join through broadcast dimension chain (TPC-H Q5 shape)
    Q("q5_region_revenue",
      (s, d) => {
        val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
        val nation = Tables.nation(s, d)
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val li = Tables.lineitem(s, d)
        val supp = Tables.supplier(s, d)
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey") &&
                      supp("s_nationkey") === cust("c_nationkey"))
          .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
          .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
                  JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
             WHERE r_name = 'ASIA'
               AND o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate < TIMESTAMP '1998-01-01'
             GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // ----------------------------------------------------------------
    // Cross-nation volume matrix (TPC-H Q7 shape): two ROLES of the
    // same dimension (supplier nation vs customer nation) — broadcast
    // twice under different aliases; the fact-side join stays one
    // shuffle on the orderkey.
    Q("q7_nation_volume",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        val supp = Tables.supplier(s, d)
        val n1 = Tables.nation(s, d).select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d).select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(n1), supp("s_nationkey") === col("sk"))
          .join(broadcast(n2), cust("c_nationkey") === col("ck"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("ship_year"))
          .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "ship_year")
      },
      Some("""SELECT supp_nation, cust_nation, ship_year,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                          CAST(year(l_shipdate) AS INT) AS ship_year,
                          l_extendedprice, l_discount
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                        JOIN supplier ON l_suppkey = s_suppkey
                        JOIN customer ON o_custkey = c_custkey
                        JOIN nation n1 ON s_nationkey = n1.n_nationkey
                        JOIN nation n2 ON c_nationkey = n2.n_nationkey
                   WHERE n1.n_name <> n2.n_name)
             GROUP BY supp_nation, cust_nation, ship_year
             ORDER BY supp_nation, cust_nation, ship_year""")),

    // ----------------------------------------------------------------
    // Product-profit by nation/year (TPC-H Q9 shape, p_retailprice as
    // the cost stand-in — the testdata has no partsupp table)
    Q("q9_product_profit",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val part = Tables.part(s, d).filter(col("p_type") === "ECONOMY")
        val supp = Tables.supplier(s, d)
        val nation = Tables.nation(s, d)
        li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
          .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
          .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
          .groupBy(col("n_name"), year(col("l_shipdate")).as("ship_year"))
          .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount")))
              - dec2(col("p_retailprice")) * dec2(col("l_quantity")))
            .cast("double").as("profit"))
          .orderBy("n_name", "ship_year")
      },
      Some("""SELECT n_name, CAST(year(l_shipdate) AS INT) AS ship_year,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                      - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
             FROM lineitem JOIN part ON l_partkey = p_partkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
             WHERE p_type = 'ECONOMY'
             GROUP BY n_name, ship_year
             ORDER BY n_name, ship_year""")),

    // ----------------------------------------------------------------
    // Returned-item report (TPC-H Q10 shape): selective fact filter
    // pushed to the scan, top-20 customers by lost revenue
    Q("q10_returned_items",
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        val nation = Tables.nation(s, d)
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, n_name, revenue FROM (
             SELECT c_custkey, c_name, n_name,
                    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
             WHERE l_returnflag = 'R'
             GROUP BY c_custkey, c_name, n_name)
             ORDER BY revenue DESC, c_custkey ASC LIMIT 20""")),

    // ----------------------------------------------------------------
    // Large-quantity orders (TPC-H Q18 shape): HAVING over a fact
    // aggregate, then join the qualifying keys back to the dimensions.
    // The duplicate (l_orderkey, l_linenumber) rows in the testdata
    // are harmless here — both engines sum the same physical rows.
    Q("q18_large_orders",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        val big = li.groupBy(col("l_orderkey"))
          .agg(sum(dec2(col("l_quantity"))).cast("double").as("total_qty"))
          .filter(col("total_qty") > 300)
        big.join(ord, big("l_orderkey") === ord("o_orderkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_totalprice"), col("total_qty"))
          .orderBy(col("total_qty").desc, col("o_orderkey").asc)
          .limit(50)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty FROM (
             SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
             FROM lineitem GROUP BY l_orderkey HAVING total_qty > 300)
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             ORDER BY total_qty DESC, o_orderkey ASC LIMIT 50""")),

    // ----------------------------------------------------------------
    // Grouped ratio-of-conditional-sums (TPC-H Q8 shape): one nation's
    // share of yearly supplier revenue. Dimensions broadcast; ONE fact
    // shuffle keyed by the group; the share is a single division of
    // two exact decimal sums surfaced as double (correctly rounded →
    // cross-engine identical without any round()).
    Q("q8_market_share",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        val supp = Tables.supplier(s, d)
        val nat = Tables.nation(s, d)
        val disc = dec2(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount")))
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
          .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg((sum(when(col("n_name") === "NATION_1", disc)
              .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double") /
            sum(disc).cast("double")).as("mkt_share"))
          .orderBy("o_year")
      },
      Some("""SELECT year(o_orderdate) AS o_year,
             CAST(sum(CASE WHEN n_name = 'NATION_1'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                           JOIN supplier ON l_suppkey = s_suppkey
                           JOIN nation ON s_nationkey = n_nationkey
             GROUP BY o_year ORDER BY o_year""")),

    // ----------------------------------------------------------------
    // Correlated EXISTS with a NON-EQUI residual (TPC-H Q4 shape):
    // left-semi on the order key PLUS l_shipdate > o_orderdate. Spark
    // keeps this one equi-semi-join with a band residual — no
    // per-order subquery execution; the probe side is pre-filtered by
    // the date window before the shuffle.
    Q("q4_order_priority",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-04-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        val li = Tables.lineitem(s, d)
        ord.join(li, ord("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > ord("o_orderdate"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-04-01'
               AND o_orderdate < TIMESTAMP '1996-07-01'
               AND EXISTS (SELECT 1 FROM lineitem
                           WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
             GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ----------------------------------------------------------------
    // Scan-only filter aggregate, no join, no grouping (TPC-H Q6
    // shape): the whole query is one parquet scan with every predicate
    // pushed + a map-side partial sum — the minimal-plan baseline the
    // join queries are judged against.
    Q("q6_revenue_forecast",
      (s, d) => {
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount").between(0.02, 0.04) && col("l_quantity") < 10)
          .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
            .cast("double").as("revenue"))
      },
      Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                              CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1997-01-01'
               AND l_shipdate < TIMESTAMP '1998-01-01'
               AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 10""")),

    // ----------------------------------------------------------------
    // Join + CASE-bucketed counts (TPC-H Q12 shape; l_returnflag
    // stands in for the ship mode this schema lacks): per flag, how
    // many high- vs low-priority orders shipped in the window.
    Q("q12_priority_shipping",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        val ord = Tables.orders(s, d)
        val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .groupBy("l_returnflag")
          // count-of-non-null, not sum-of-0/1: both engines agree it is
          // BIGINT (DuckDB widens SUM of ints past int64)
          .agg(count(when(isHigh, lit(1))).as("high_line_count"),
            count(when(!isHigh, lit(1))).as("low_line_count"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
             count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             WHERE l_shipdate >= TIMESTAMP '1997-01-01'
               AND l_shipdate < TIMESTAMP '1998-01-01'
             GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ----------------------------------------------------------------
    // LEFT OUTER join with an ON-side filter + double aggregation
    // (TPC-H Q13 shape): customers keyed by how many qualifying orders
    // they have — including the zero-order customers an inner join
    // would drop — then the distribution of those counts.
    Q("q13_customer_distribution",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d).filter(col("o_orderpriority") =!= "5-LOW")
        cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
             SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer LEFT OUTER JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
             GROUP BY c_custkey)
             GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")),

    // ----------------------------------------------------------------
    // Conditional-revenue ratio (TPC-H Q14 shape): one join month,
    // promo share of revenue as 100 * conditional-sum / sum — both
    // sums exact decimal, the one division done in double and rounded.
    Q("q14_promo_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
        val part = Tables.part(s, d)
        val disc = dec2(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount")))
        li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
          .agg(round(lit(100) * sum(when(col("p_type") === "PROMO", disc)
              .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double") /
            sum(disc).cast("double"), 4).as("promo_revenue"))
      },
      Some("""SELECT round(100 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS promo_revenue
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE l_shipdate >= TIMESTAMP '1997-06-01'
               AND l_shipdate < TIMESTAMP '1997-07-01'""")),

    // ----------------------------------------------------------------
    // Correlated scalar-aggregate compare (TPC-H Q17 shape): items
    // ordered below 20% of their part's average quantity. The
    // correlated avg subquery becomes ONE per-part aggregate joined
    // back — per-key agg-join decorrelation (j9 is the window variant;
    // this is the join variant, the right one when the aggregate side
    // compresses well below the probe side).
    Q("q17_small_quantity_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val part = Tables.part(s, d)
          .filter(col("p_brand") === "Brand#13" && col("p_size") < 15)
        val perPart = li.groupBy(col("l_partkey").as("a_partkey"))
          .agg((sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)))
            .as("avg_qty"))
        li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
          .join(perPart, li("l_partkey") === col("a_partkey"))
          .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
          .agg(round(sum(dec2(col("l_extendedprice"))).cast("double") / 7.0, 4)
            .as("avg_yearly"))
      },
      Some("""SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4) AS avg_yearly
             FROM lineitem JOIN part ON l_partkey = p_partkey
             JOIN (SELECT l_partkey AS a_partkey,
                          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
                   FROM lineitem GROUP BY l_partkey) ON l_partkey = a_partkey
             WHERE p_brand = 'Brand#13' AND p_size < 15
               AND l_quantity < 0.2 * avg_qty""")),

    // ----------------------------------------------------------------
    // Disjunctive join predicate (TPC-H Q19 shape): OR of three
    // brand/size/quantity conjunction branches on top of the part-key
    // equi-join. Catalyst must still extract the equi condition for
    // the join and evaluate the disjunction as a post-join filter —
    // the classic test that OR branches don't force a nested loop.
    Q("q19_disjunctive_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val part = Tables.part(s, d)
        val branches =
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#20" && col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 30) &&
            col("l_quantity").between(20, 30))
        li.join(broadcast(part), li("l_partkey") === part("p_partkey") && branches)
          .agg(sum(dec2(col("l_extendedprice")) *
              (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
            .cast("double").as("revenue"))
      },
      Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
                OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
                OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)""")),

    // ----------------------------------------------------------------
    // Global-scalar threshold + NOT EXISTS (TPC-H Q22 shape): segments
    // of above-average-balance customers who never ordered. The scalar
    // average broadcasts as a 1-row cross join; the NOT EXISTS is a
    // left-anti join on the customer key.
    Q("q22_sales_opportunity",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d)
        val avgBal = cust.filter(col("c_acctbal") > 0)
          .agg((sum(dec2(col("c_acctbal"))).cast("double") / count(lit(1)))
            .as("avg_bal"))
        cust.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("numcust"),
            sum(dec2(col("c_acctbal"))).cast("double").as("totacctbal"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS numcust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
             FROM customer
             WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                                FROM customer WHERE c_acctbal > 0)
               AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ----------------------------------------------------------------
    // TPC-H Q2 shape: correlated min-subquery → per-group window min.
    // No partsupp table in the testdata — the part↔supplier relation is
    // derived from lineitem (distinct pairs, min unit price as the
    // supply cost), which preserves the query's join/subquery shape.
    // Scale: the window shuffles once on ps_partkey; every dimension
    // (supplier/nation/region/filtered part) broadcasts.
    Q("q2_min_cost_supplier",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        // the correlated subquery's domain AND the output are both
        // EUROPE-restricted, so the region semi-join pushes BELOW the
        // pair aggregation: the (partkey, suppkey) shuffle carries
        // only the region's fraction of lineitem (12.2 → ~2.5 MB at
        // sf0.1) — supplier attributes re-join broadcast-side after
        // the window filter, against the tiny winner set
        val euroSupp = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
        val ps = li
          .join(broadcast(euroSupp.select(col("s_suppkey"))),
            col("l_suppkey") === col("s_suppkey"), "left_semi")
          .groupBy("l_partkey", "l_suppkey")
          .agg(min(dec2(col("l_extendedprice"))).cast("double").as("ps_supplycost"))
        val best = ps
          .withColumn("min_cost", min(col("ps_supplycost"))
            .over(Window.partitionBy(col("l_partkey"))))
          .filter(col("ps_supplycost") === col("min_cost"))
        best
          .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.part(s, d)
            .filter(col("p_size") <= 15 && col("p_type") === "PROMO")),
            col("l_partkey") === col("p_partkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_name"), col("ps_supplycost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some("""WITH ps AS (
             SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                    CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS ps_supplycost
             FROM lineitem GROUP BY 1, 2)
             SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
             FROM ps JOIN part ON p_partkey = ps_partkey
                     JOIN supplier ON s_suppkey = ps_suppkey
                     JOIN nation ON s_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
             WHERE p_size <= 15 AND p_type = 'PROMO' AND r_name = 'EUROPE'
               AND ps_supplycost = (
                 SELECT min(ps2.ps_supplycost) FROM ps ps2
                 JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
                 JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                 JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                 WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
             ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""")),

    // ----------------------------------------------------------------
    // TPC-H Q11 shape: grouped value HAVING > global-scalar threshold
    // (the scalar rides a broadcast cross join, never a collect).
    // Exact-decimal products: qty is cast to DECIMAL(9,2) and the
    // product to DECIMAL(27,4) so neither engine's precision-promotion
    // rules can bite.
    Q("q11_important_parts",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ps = li.groupBy("l_partkey", "l_suppkey")
          .agg(sum(dec2(col("l_quantity"))).cast(DecimalType(9, 2)).as("ps_qty"),
            min(dec2(col("l_extendedprice"))).as("ps_cost"))
        val natps = ps
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name").isin("NATION_7", "NATION_8", "NATION_9"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("l_partkey").as("ps_partkey"),
            (col("ps_cost") * col("ps_qty")).cast(DecimalType(27, 4)).as("val"))
        // aggregate ONCE: the global threshold is the sum of the
        // per-part DECIMAL sums (decimal addition is exact, so
        // Σ_parts Σ_group val ≡ Σ val bit-for-bit; the double cast
        // happens once at the end exactly as the oracle's) — the
        // un-cached form re-ran the whole lineitem aggregation + joins
        // a second time just to produce the one threshold row
        val grouped = natps.groupBy("ps_partkey")
          .agg(sum(col("val")).as("dval"))
          .transform(graft.Caching.persistOnce(_))
        val threshold = grouped
          .agg((sum(col("dval")).cast("double") * 0.001).as("threshold"))
        grouped
          .select(col("ps_partkey"), col("dval").cast("double").as("part_value"))
          .crossJoin(broadcast(threshold))
          .filter(col("part_value") > col("threshold"))
          .select(col("ps_partkey"), col("part_value"))
          .orderBy(col("part_value").desc, col("ps_partkey"))
      },
      Some("""WITH ps AS (
             SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(9,2)) AS ps_qty,
                    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_cost
             FROM lineitem GROUP BY 1,2),
             natps AS (
             SELECT ps_partkey, CAST(ps_cost * ps_qty AS DECIMAL(27,4)) AS val
             FROM ps JOIN supplier ON s_suppkey = ps_suppkey
                     JOIN nation ON s_nationkey = n_nationkey
             WHERE n_name IN ('NATION_7','NATION_8','NATION_9'))
             SELECT ps_partkey, CAST(sum(val) AS DOUBLE) AS part_value
             FROM natps GROUP BY ps_partkey
             HAVING CAST(sum(val) AS DOUBLE) > (SELECT CAST(sum(val) AS DOUBLE) * 0.001 FROM natps)
             ORDER BY part_value DESC, ps_partkey""")),

    // ----------------------------------------------------------------
    // TPC-H Q15 shape: revenue view + scalar-max equality (top supplier)
    Q("q15_top_supplier",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val rev = li
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .groupBy("l_suppkey")
          .agg(sum(dec2(col("l_extendedprice")) *
              (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
            .cast("double").as("total_revenue"))
          // consumed twice (scalar max + the join): un-cached, the
          // filtered lineitem aggregation runs once per consumer
          .transform(graft.Caching.persistOnce(_))
        val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
        Tables.supplier(s, d)
          .join(rev, col("s_suppkey") === col("l_suppkey"))
          .crossJoin(broadcast(maxRev))
          .filter(col("total_revenue") === col("max_rev"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH revenue AS (
             SELECT l_suppkey AS supplier_no,
                    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
             GROUP BY 1)
             SELECT s_suppkey, s_name, total_revenue
             FROM supplier JOIN revenue ON s_suppkey = supplier_no
             WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
             ORDER BY s_suppkey""")),

    // ----------------------------------------------------------------
    // TPC-H Q16 shape: NOT IN exclusion (anti join) + count distinct
    // per part attribute over the derived part↔supplier pairs
    Q("q16_supplier_count",
      (s, d) => {
        // part-attribute filter and supplier exclusion push BELOW the
        // distinct: the pair-dedup shuffle then carries only rows that
        // can reach the output (the part filter is ~16% selective —
        // on the naive order the distinct shuffles the full pair set
        // first and filters after)
        val excluded = Tables.supplier(s, d)
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        val parts = Tables.part(s, d).filter(col("p_brand") =!= "Brand#5" &&
          !col("p_type").isin("PROMO", "ECONOMY") &&
          col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 36))
        Tables.lineitem(s, d)
          .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"), col("l_suppkey"),
            col("p_brand"), col("p_type"), col("p_size"))
          .distinct()
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
             FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem) ps
             JOIN part ON p_partkey = ps_partkey
             WHERE p_brand <> 'Brand#5' AND p_type NOT IN ('PROMO','ECONOMY')
               AND p_size IN (1,4,9,14,19,24,28,36)
               AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             GROUP BY p_brand, p_type, p_size
             ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // ----------------------------------------------------------------
    // TPC-H Q20 shape: nested IN chains — suppliers of 'small%' parts
    // whose pre-1997 supplied quantity exceeds half their 1997+
    // shipments. The correlated scalar decorlates into the SAME
    // (partkey, suppkey) grouping as the outer aggregate, so both
    // sums ride ONE scan as conditional aggregates — one shuffle, no
    // self-join (the naive form scans lineitem twice and joins the two
    // aggregates back together). Null conditional sums drop on the
    // comparison, reproducing SQL's NULL-excludes-row semantics.
    Q("q20_potential_promotion",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val cut = lit("1997-01-01").cast("timestamp")
        val smallParts = Tables.part(s, d)
          .filter(col("p_name").like("small%")).select(col("p_partkey"))
        val qualifying = li
          .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy("l_partkey", "l_suppkey")
          .agg(
            sum(when(col("l_shipdate") < cut, dec2(col("l_quantity"))))
              .cast("double").as("availqty"),
            sum(when(col("l_shipdate") >= cut, dec2(col("l_quantity"))))
              .cast("double").as("laterqty"))
          .filter(col("availqty") > col("laterqty") * 0.5)
          .select(col("l_suppkey")).distinct()
        Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name").isin("NATION_3", "NATION_4"))),
            col("s_nationkey") === col("n_nationkey"))
          .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_name"), col("s_acctbal"))
          .orderBy(col("s_name"))
      },
      Some("""SELECT s_name, s_acctbal
             FROM supplier JOIN nation ON s_nationkey = n_nationkey
             WHERE n_name IN ('NATION_3','NATION_4')
               AND s_suppkey IN (
                 SELECT ps.suppkey FROM (
                   SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS availqty
                   FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01' GROUP BY 1,2) ps
                 WHERE ps.partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
                   AND ps.availqty > (
                     SELECT 0.5 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     FROM lineitem l2
                     WHERE l2.l_partkey = ps.partkey AND l2.l_suppkey = ps.suppkey
                       AND l2.l_shipdate >= TIMESTAMP '1997-01-01'))
             ORDER BY s_name""")),

    // ----------------------------------------------------------------
    // TPC-H Q21 shape: stacked EXISTS + NOT-EXISTS self-joins on
    // lineitem (the hardest public semi/anti stack). l_receiptdate >
    // l_commitdate isn't in the testdata; l_returnflag = 'R' stands in
    // as the per-lineitem "failed" predicate, preserving the shape:
    // the supplier's line failed, ANOTHER supplier shares the order,
    // and NO other supplier failed it. Scale: the narrowed l1 shuffles
    // once on l_orderkey and that exchange feeds the orders join, the
    // semi and the anti (same key); supplier/nation broadcast.
    Q("q21_waiting_supplier",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val l1 = li.filter(col("l_returnflag") === "R")
          .join(broadcast(Tables.supplier(s, d)
            .join(broadcast(Tables.nation(s, d)
              .filter(col("n_name").isin("NATION_1", "NATION_2"))),
              col("s_nationkey") === col("n_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
        val others = li.select(col("l_orderkey").as("o2_orderkey"),
          col("l_suppkey").as("o2_suppkey"))
        val othersFailed = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("o3_orderkey"), col("l_suppkey").as("o3_suppkey"))
        l1.join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .join(others, col("l_orderkey") === col("o2_orderkey") &&
            col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
          .join(othersFailed, col("l_orderkey") === col("o3_orderkey") &&
            col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""SELECT s_name, count(*) AS numwait
             FROM lineitem l1
             JOIN orders ON o_orderkey = l1.l_orderkey
             JOIN supplier ON s_suppkey = l1.l_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
               AND n_name IN ('NATION_1','NATION_2')
               AND EXISTS (SELECT 1 FROM lineitem l2
                           WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
               AND NOT EXISTS (SELECT 1 FROM lineitem l3
                               WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                                 AND l3.l_returnflag = 'R')
             GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""")),

    // ----------------------------------------------------------------
    // J2: left-semi join (EXISTS / IN-subquery shape, schema.sql:426-427)
    Q("j2_semi_join",
      (s, d) => {
        val ord = Tables.orders(s, d)
        val bigLines = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
        ord.join(bigLines, ord("o_orderkey") === bigLines("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             WHERE EXISTS (SELECT 1 FROM lineitem
                           WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
             ORDER BY o_orderkey""")),

    // ----------------------------------------------------------------
    // J6: left-anti join (NOT EXISTS; trigger first-event check shape)
    Q("j6_anti_join",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d)
        cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_nationkey")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey FROM customer
             WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             ORDER BY c_custkey""")),

    // ----------------------------------------------------------------
    // J3: cross join (view-fanout shape, schema.sql:244-252)
    Q("j3_cross_join",
      (s, d) => {
        Tables.region(s, d).crossJoin(Tables.supplier(s, d))
          .select("r_name", "s_name", "s_nationkey")
          .orderBy("r_name", "s_name")
      },
      Some("""SELECT r_name, s_name, s_nationkey FROM region CROSS JOIN supplier
             ORDER BY r_name, s_name""")),

    // ----------------------------------------------------------------
    // J9: correlated per-group subquery, de-correlated to a window
    // (largest order per customer — rank-1, no float comparisons)
    Q("j9_largest_order_per_customer",
      (s, d) => {
        val ord = Tables.orders(s, d)
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        ord.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("o_custkey", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
             SELECT o_custkey, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             FROM orders) WHERE rn = 1 ORDER BY o_custkey""")),

    // ----------------------------------------------------------------
    // A6: filtered aggregates (COUNT FILTER shape, test-helpers.sql:252-256)
    Q("a6_filtered_agg",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_events"),
            count(when(col("value") > 100, 1)).as("n_big"),
            sum(dec2(col("value"))).cast("double").as("sum_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n_events,
             count(CASE WHEN value > 100 THEN 1 END) AS n_big,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             FROM events GROUP BY event_type ORDER BY event_type""")),

    // ----------------------------------------------------------------
    // A7: min/max/avg/round summary stats per group
    Q("a7_segment_stats",
      (s, d) => {
        Tables.customer(s, d)
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n_cust"),
            min("c_acctbal").as("min_bal"),
            max("c_acctbal").as("max_bal"),
            avg4(col("c_acctbal")).as("avg_bal"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, count(*) AS n_cust,
             min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
             ${avg4Sql("c_acctbal")} AS avg_bal
             FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ----------------------------------------------------------------
    // A8: ordered array aggregation (json_agg shape)
    Q("a8_array_agg",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(array_join(sort_array(collect_set(col("event_type"))), ",").as("event_types"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types
             FROM events GROUP BY user_id ORDER BY user_id""")),

    // ----------------------------------------------------------------
    // CUBE grouping sets (extended-analytics aggregation surface)
    Q("a_cube_returnflag",
      (s, d) => {
        // pre-aggregate to the base (returnflag, linestatus) cells
        // BEFORE the cube: CUBE's Expand otherwise multiplies every
        // fact row 4× ahead of the partial aggregation. Re-aggregating
        // group sums is exact (decimal addition; counts sum as longs)
        // and every cube cell is a union of base cells, so the output
        // is bit-identical — the oracle keeps the raw-table CUBE.
        Tables.lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum(dec2(col("l_quantity"))).as("dq"), count(lit(1)).as("cn"))
          .cube("l_returnflag", "l_linestatus")
          .agg(sum(col("dq")).cast("double").as("sum_qty"),
            sum(col("cn")).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n
             FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ----------------------------------------------------------------
    // ROLLUP grouping sets (hierarchical subtotals — the companion to
    // a_cube_returnflag).
    Q("a_rollup_nation_segment",
      (s, d) => {
        Tables.customer(s, d)
          .rollup("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double").as("total_bal"))
          .orderBy(col("c_nationkey").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
      },
      Some("""SELECT c_nationkey, c_mktsegment, count(*) AS n,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             FROM customer GROUP BY ROLLUP (c_nationkey, c_mktsegment)
             ORDER BY c_nationkey ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""")),

    // ----------------------------------------------------------------
    // W3: window frame running sum (ROWS BETWEEN ... AND CURRENT ROW).
    // The raw table contains duplicate (l_orderkey, l_linenumber) rows,
    // so we pre-aggregate to unique keys first — otherwise no total
    // order exists and the running values are engine-order-dependent.
    Q("w3_running_sum",
      (s, d) => {
        // ONE data shuffle total (was two + a WindowExec): a RANGE
        // partitioning on l_suppkey alone (a) satisfies the 3-key
        // aggregation's clustering (subset partitioning co-locates
        // every group), (b) puts each suppkey's rows WHOLE into one
        // partition, so the running sum is GlobalIndex's streaming
        // reset-on-key pass — no WindowExec buffering — and (c) leaves
        // the output key-major range-ordered, so the contractual
        // presentation order (l_suppkey, l_orderkey, l_linenumber) is
        // a partition-LOCAL re-sort, not a second global exchange.
        // Quantities ride as exact cents (decimal(18,2)·100 → long);
        // the final /100.0 double equals DuckDB's decimal→double cast
        // (both correctly rounded from the same rational) PROVIDED the
        // running total stays below 2^53 cents — above that the long
        // is no longer exactly representable as a double and the
        // cast→divide can differ from the single decimal→double
        // rounding by 1 ulp. 2^53 cents ≈ 9e13 quantity units per
        // supplier: unreachable at any TPC-H scale (sf100k sums
        // ~2.4e10), but the equality claim carries the precondition.
        val agg = Tables.lineitem(s, d)
          .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
          .repartitionByRange(col("l_suppkey"))
          .groupBy("l_suppkey", "l_orderkey", "l_linenumber")
          .agg(sum(dec2(col("l_quantity"))).as("qty"),
               min(col("l_shipdate")).as("first_ship"))
          .withColumn("qc", (col("qty") * 100).cast("long"))
        graft.store.GlobalIndex.withKeyedRunningSum(agg, Seq("l_suppkey"),
            Seq(col("first_ship"), col("l_orderkey"), col("l_linenumber")),
            "qc", "rqc", partitionByKey = false)
          .withColumn("running_qty", col("rqc").cast("double") / 100.0)
          .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
          .sortWithinPartitions("l_suppkey", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(sum(qty) OVER (
               PARTITION BY l_suppkey
               ORDER BY first_ship, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
             FROM (SELECT l_suppkey, l_orderkey, l_linenumber,
                          sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty,
                          min(l_shipdate) AS first_ship
                   FROM lineitem GROUP BY 1,2,3)
             ORDER BY l_suppkey, l_orderkey, l_linenumber""")),

    // ----------------------------------------------------------------
    // W4: ntile ranking over a global ordering. Two implementations,
    // one oracle: (a) the builtin unpartitioned window — correct but
    // single-task, kept as the SMALL-DIMENSION-ONLY form; (b) the
    // scale path below (w4b) via GlobalIndex.
    Q("w4_ntile_quartiles",
      (s, d) => {
        val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        Tables.customer(s, d)
          .withColumn("quartile", ntile(4).over(w))
          .select("c_custkey", "quartile")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
             FROM customer ORDER BY c_custkey""")),

    // Scalable global ntile: range-partitioned parallel sort + prefix
    // sums (GlobalIndex) + the exact ntile bucket formula — no
    // single-partition window anywhere; verified against the same
    // DuckDB ntile oracle as w4.
    Q("w4b_ntile_scalable",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val n = cust.count()
        val k = 4L
        val big = (n + k - 1) / k          // ceil(n/k)
        val small = n / k
        val m = n % k                      // number of big buckets (first)
        val indexed = graft.store.GlobalIndex.withOrderedIndex(
          cust.select("c_custkey", "c_acctbal"),
          Seq(col("c_acctbal").asc, col("c_custkey").asc), "idx")
        // m is a driver-side constant: branch here rather than shipping a
        // `when(lit(m) === 0, …)` into the plan (Spark warns on the
        // trivially-true predicate and the dead branch survives codegen).
        // `col / small` divides as DOUBLE; the floor-on-cast is exact
        // while idx stays under 2^53 (~9e15 rows) — far beyond any real
        // table, but use floor(integral division) if that ever changes.
        val bucket =
          if (m == 0) (col("idx") / small).cast("long") + 1
          else when(col("idx") < m * big, (col("idx") / big).cast("long") + 1)
            .otherwise(lit(m) + ((col("idx") - m * big) / small).cast("long") + 1)
        indexed
          .withColumn("quartile", bucket.cast("int"))
          .select("c_custkey", "quartile")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
             FROM customer ORDER BY c_custkey""")),

    // ----------------------------------------------------------------
    // GROUPING SETS with grouping_id (the reporting superset of
    // a_cube/a_rollup): three explicit sets — (flag, status), (flag),
    // and grand total — one Expand + one aggregate Exchange, NOT three
    // scans. grouping_id disambiguates the null-as-subtotal rows.
    Q("a_grouping_sets",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")),
              Seq(col("l_returnflag")), Seq.empty),
            col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"))
          .select("l_returnflag", "l_linestatus", "gid", "n")
          // explicit NULLS FIRST: the engines' ASC defaults differ
          // (Spark nulls first, DuckDB nulls last)
          .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid, count(*) AS n
             FROM lineitem
             GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
             ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ----------------------------------------------------------------
    // Demonstrably-safe skew mitigation: the salted equi-join
    // (SkewJoin.saltedJoin — fact rows salted into 8 buckets, the
    // dimension replicated 8×) must be row-for-row identical to the
    // plain join, and the DuckDB oracle IS the plain join — the
    // rewrite's semantics-invariance is hash-verified, not asserted.
    // The manual fallback for when one hot key defeats AQE's skew
    // split (e.g. SMJ against a dimension above the broadcast ceiling).
    Q("j_salted_skew_join",
      (s, d) => {
        val fact = Tables.lineitem(s, d).select(col("l_suppkey").as("suppkey"),
          col("l_extendedprice"), col("l_discount"))
        val dim = Tables.supplier(s, d).select(col("s_suppkey").as("suppkey"),
          col("s_name"))
        SkewJoin.saltedJoin(fact, dim, "suppkey", salts = 8)
          .groupBy("s_name")
          .agg(count(lit(1)).as("n_items"),
            sum(dec2(col("l_extendedprice")) *
              (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
              .cast("double").as("revenue"))
          .orderBy("s_name")
      },
      Some("""SELECT s_name, count(*) AS n_items,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             GROUP BY s_name ORDER BY s_name""")),

    // ----------------------------------------------------------------
    // O3: top-k with deterministic tie-break (TakeOrderedAndProject)
    Q("o3_topk_orders",
      (s, d) => {
        Tables.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(15)
          .select("o_orderkey", "o_custkey", "o_totalprice")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""")),

    // ----------------------------------------------------------------
    // Set operations: INTERSECT / EXCEPT / UNION (SURVEY §2.7)
    Q("set_intersect_nations",
      (s, d) => {
        Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
          .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
          .orderBy("nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""")),

    Q("set_except_nations",
      (s, d) => {
        Tables.nation(s, d).select(col("n_nationkey").as("nationkey"))
          .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
          .orderBy("nationkey")
      },
      Some("""SELECT n_nationkey AS nationkey FROM nation
             EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""")),

    Q("set_union_users",
      (s, d) => {
        val ev = Tables.events(s, d)
        ev.filter(col("event_type") === "signup").select(col("user_id"))
          .union(ev.filter(col("event_type") === "purchase").select(col("user_id")))
          .distinct()
          .orderBy("user_id")
      },
      Some("""SELECT user_id FROM events WHERE event_type = 'signup'
             UNION SELECT user_id FROM events WHERE event_type = 'purchase'
             ORDER BY user_id""")),

    // ----------------------------------------------------------------
    // F1-F11 scalar function sampler: string/date/math/json/conditional
    Q("f_scalar_kitchen",
      (s, d) => {
        Tables.events(s, d)
          .filter(col("user_id") < 5)
          .select(
            col("event_id"),
            upper(col("event_type")).as("etype_u"),
            concat(col("event_type"), lit("#"), col("user_id").cast("string")).as("tag"),
            length(col("props")).as("props_len"),
            get_json_object(col("props"), "$.k").cast("int").as("k_val"),
            date_trunc("DAY", col("ts")).cast("timestamp_ntz").as("day_ts"),
            pmod(col("event_id"), lit(7)).as("id_mod7"),
            round(col("value") * 2.0, 2).as("v2"),
            dec2(col("value")).cast("double").as("vdec"),
            substring(col("event_type"), 1, 3).as("et3"),
            coalesce(nullif(col("event_type"), lit("click")), lit("CLICKED")).as("et_nn"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, upper(event_type) AS etype_u,
             event_type || '#' || CAST(user_id AS VARCHAR) AS tag,
             length(props) AS props_len,
             CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
             date_trunc('day', ts) AS day_ts,
             event_id % 7 AS id_mod7,
             round(value * 2.0, 2) AS v2,
             CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS vdec,
             substring(event_type, 1, 3) AS et3,
             coalesce(nullif(event_type, 'click'), 'CLICKED') AS et_nn
             FROM events WHERE user_id < 5 ORDER BY event_id"""))
  )
}
