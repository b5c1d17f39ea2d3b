package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.tables.Tables

/** Relational operator coverage over the TPC-H-ish harness tables.
  *
  * Maps SURVEY.md §2's inventory onto declarative DataFrame plans:
  * scans (S1), projections (P1/P7), filters (F1-F8 shapes), equi-joins /
  * semi / anti / self-join pairs (J1-J4), hash aggregations (A1-A8),
  * sorts & top-k (O1-O4), and set ops (E1-E2). Everything is expressed
  * with `org.apache.spark.sql.functions` so Catalyst handles pushdown,
  * pruning, partial aggregation, broadcast selection and AQE; no UDFs.
  *
  * Scale notes (100 TB thinking):
  *  - dimension joins (`part`, `nation`, `region`, `supplier`, top-k order
  *    lists) are explicitly `broadcast()` — they stay small at any SF;
  *  - fact-fact joins (lineitem ⋈ orders) shuffle on the join key and are
  *    AQE-coalesced; no driver-side collect anywhere;
  *  - top-k uses orderBy+limit which Spark plans as TakeOrderedAndProject
  *    (per-partition heap, no global sort).
  */
object Relational extends QueryProvider {

  // Predicate constants shared by Spark and oracle text.
  private val shipCut = "2000-06-30 00:00:00"
  private val q3Date = "1998-01-01 00:00:00"

  override val all: Seq[Q] = Seq(
    // ---- A: aggregations over one fact table (TPC-H Q1 shape: F+A+O) ----
    Q(
      "q01_pricing_summary",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" <= lit(shipCut).cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            round(sum($"l_quantity"), 2).as("sum_qty"),
            round(sum($"l_extendedprice"), 2).as("sum_base_price"),
            // 4e9-magnitude sums of 4/6-decimal products exceed double-sum
            // reproducibility across engines: aggregate EXACTLY in decimal
            // (inputs are 2-decimal quantities) and cast the exact result
            // back to double — both engines then produce the identical value.
            sum($"l_extendedprice".cast("decimal(14,2)") *
              (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(3,2)")))
              .cast("double").as("sum_disc_price"),
            sum($"l_extendedprice".cast("decimal(14,2)") *
              (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(3,2)")) *
              (lit(1).cast("decimal(3,2)") + $"l_tax".cast("decimal(3,2)")))
              .cast("double").as("sum_charge"),
            round(avg($"l_quantity"), 4).as("avg_qty"),
            round(avg($"l_extendedprice"), 4).as("avg_price"),
            round(avg($"l_discount"), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |round(sum(l_quantity),2) AS sum_qty,
              |round(sum(l_extendedprice),2) AS sum_base_price,
              |CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
              |CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
              |round(avg(l_quantity),4) AS avg_qty,
              |round(avg(l_extendedprice),4) AS avg_price,
              |round(avg(l_discount),6) AS avg_disc,
              |count(*) AS count_order
              |FROM lineitem WHERE l_shipdate <= TIMESTAMP '$shipCut'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true),

    // ---- Filter + projection, pushed to the parquet scan (F*, P7) ----
    Q(
      "q02_filter_project",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= lit("1999-01-01 00:00:00").cast("timestamp") &&
            $"l_shipdate" < lit("1999-04-01 00:00:00").cast("timestamp") &&
            $"l_discount" > 0.05 && $"l_quantity" < 10.0)
          .select($"l_orderkey", $"l_linenumber", $"l_partkey",
            round($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("net_price"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey,
             |round(l_extendedprice*(1-l_discount),4) AS net_price
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
             |AND l_shipdate < TIMESTAMP '1999-04-01 00:00:00'
             |AND l_discount > 0.05 AND l_quantity < 10.0
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- 3-way join + agg + top-k (TPC-H Q3 shape: J1+A5+O2) ----
    Q(
      "q03_shipping_priority",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
        val ord = Tables.orders(s, dir)
          .filter($"o_orderdate" < lit(q3Date).cast("timestamp"))
        val li = Tables.lineitem(s, dir)
          .filter($"l_shipdate" > lit(q3Date).cast("timestamp"))
        // customer is the small side at every SF (1.5k rows/SF0.01): broadcast
        // it into orders, then shuffle-join the joined keys into lineitem.
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .groupBy($"l_orderkey", $"o_orderdate")
          .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"))
          .orderBy(desc("revenue"), $"l_orderkey")
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate,
              |round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
              |FROM customer, orders, lineitem
              |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
              |AND l_orderkey = o_orderkey
              |AND o_orderdate < TIMESTAMP '$q3Date'
              |AND l_shipdate > TIMESTAMP '$q3Date'
              |GROUP BY l_orderkey, o_orderdate
              |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
      bench = true),

    // ---- Broadcast dimension join (J1 small side) ----
    Q(
      "q04_brand_volume",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand")
          .agg(
            count(lit(1)).as("n_items"),
            round(sum($"l_quantity"), 2).as("total_qty"),
            round(avg($"l_extendedprice"), 4).as("avg_price"))
          .orderBy($"p_brand")
      },
      Some("""SELECT p_brand, count(*) AS n_items,
             |round(sum(l_quantity),2) AS total_qty,
             |round(avg(l_extendedprice),4) AS avg_price
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      bench = true),

    // ---- Global top-k: TakeOrderedAndProject, no full sort (O2) ----
    Q(
      "q05_top_orders",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("o_totalprice"))
          .orderBy(desc("o_totalprice"), $"o_orderkey")
          .limit(15)
      },
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS o_totalprice
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin)),

    // ---- Distinct aggregation (A3/E2) ----
    Q(
      "q06_segment_stats",
      (s, dir) => {
        import s.implicits._
        Tables.customer(s, dir)
          .groupBy($"c_mktsegment")
          .agg(
            count(lit(1)).as("n_cust"),
            countDistinct($"c_nationkey").as("n_nations"),
            // acctbal is a 2dp quantity: sum in DECIMAL so partition
            // order is unobservable, and derive avg from the exact
            // decimal quotient — a double avg() here landed EXACTLY on
            // the .5 grid boundary (167633.53/40 = 4190.83825) and the
            // 4th decimal flipped with summation order
            sum($"c_acctbal".cast("decimal(18,2)")).cast("double")
              .as("sum_bal"),
            // quotient taken in DOUBLE on both engines (DuckDB coerces
            // decimal division to double) so the rounding input is the
            // SAME bit pattern on both sides
            round(sum($"c_acctbal".cast("decimal(18,2)")).cast("double") /
              count(lit(1)), 4).as("avg_bal"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_cust,
             |count(DISTINCT c_nationkey) AS n_nations,
             |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
             |CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))) / count(*), 4)
             |  AS DOUBLE) AS avg_bal
             |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---- Window functions: per-group ranking (extension of O3 shape) ----
    Q(
      "q07_top_orders_per_cust",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy(desc("o_totalprice"), $"o_orderkey")
        Tables.orders(s, dir)
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 2)
          .select($"o_custkey", $"rk", $"o_orderkey",
            round($"o_totalprice", 2).as("o_totalprice"))
          .orderBy($"o_custkey", $"rk")
      },
      Some("""SELECT o_custkey, rk, o_orderkey, round(o_totalprice,2) AS o_totalprice
             |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             |row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
             |FROM orders) WHERE rk <= 2
             |ORDER BY o_custkey, rk""".stripMargin),
      bench = true),

    // ---- Self-join pair enumeration (J2 shape with src<dst dedup) ----
    Q(
      "q08_nation_pairs",
      (s, dir) => {
        import s.implicits._
        val n1 = Tables.nation(s, dir).select($"n_nationkey".as("k1"), $"n_name".as("name1"), $"n_regionkey".as("r1"))
        val n2 = Tables.nation(s, dir).select($"n_nationkey".as("k2"), $"n_name".as("name2"), $"n_regionkey".as("r2"))
        n1.join(n2, $"r1" === $"r2" && $"k1" < $"k2")
          .select($"k1", $"k2", $"name1", $"name2", $"r1".as("regionkey"))
          .orderBy($"k1", $"k2")
      },
      Some("""SELECT a.n_nationkey AS k1, b.n_nationkey AS k2,
             |a.n_name AS name1, b.n_name AS name2, a.n_regionkey AS regionkey
             |FROM nation a JOIN nation b
             |ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
             |ORDER BY k1, k2""".stripMargin)),

    // ---- Semi join (EXISTS) ----
    Q(
      "q09_customers_with_open_orders",
      (s, dir) => {
        import s.implicits._
        val open = Tables.orders(s, dir).filter($"o_orderstatus" === "O")
          .select($"o_custkey")
        Tables.customer(s, dir)
          .join(open, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
             |ORDER BY c_custkey""".stripMargin)),

    // ---- Anti join (NOT EXISTS) ----
    Q(
      "q10_parts_not_recently_shipped",
      (s, dir) => {
        import s.implicits._
        val recent = Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= lit("2001-01-01 00:00:00").cast("timestamp"))
          .select($"l_partkey")
        Tables.part(s, dir)
          .join(recent, $"p_partkey" === $"l_partkey", "left_anti")
          .select($"p_partkey", $"p_name", $"p_brand")
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, p_name, p_brand FROM part
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
             |AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
             |ORDER BY p_partkey""".stripMargin)),

    // ---- Set ops: UNION / INTERSECT / EXCEPT (E1/E2) ----
    Q(
      "q11_nationkey_setops",
      (s, dir) => {
        import s.implicits._
        val c = Tables.customer(s, dir).select($"c_nationkey".cast("long").as("nationkey")).distinct()
        val p = Tables.supplier(s, dir).select($"s_nationkey".cast("long").as("nationkey")).distinct()
        val u = c.union(p).distinct().withColumn("op", lit("union"))
        val i = c.intersect(p).withColumn("op", lit("intersect"))
        val e = c.except(p).withColumn("op", lit("except"))
        u.union(i).union(e).select($"op", $"nationkey").orderBy($"op", $"nationkey")
      },
      Some("""WITH c AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer),
             |s AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier),
             |x AS (
             |SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
             |UNION ALL
             |SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
             |UNION ALL
             |SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s))
             |SELECT op, nationkey FROM x ORDER BY op, nationkey""".stripMargin)),

    // ---- Event-time tumbling aggregation, batch form (§2.12 extension) ----
    Q(
      "q12_events_hourly",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
          .agg(
            count(lit(1)).as("n"),
            round(sum($"value"), 2).as("sum_value"),
            countDistinct($"user_id").as("n_users"))
          .orderBy($"hour", $"event_type")
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             |count(*) AS n, round(sum(value),2) AS sum_value,
             |count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
      bench = true),

    // ---- Agg + HAVING ----
    Q(
      "q13_big_suppliers",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .groupBy($"l_suppkey")
          .agg(count(lit(1)).as("n_items"), round(sum($"l_quantity"), 2).as("qty"))
          .filter($"n_items" > 400)
          .orderBy($"l_suppkey")
      },
      Some("""SELECT l_suppkey, count(*) AS n_items, round(sum(l_quantity),2) AS qty
             |FROM lineitem GROUP BY l_suppkey HAVING count(*) > 400
             |ORDER BY l_suppkey""".stripMargin)),

    // ---- 6-way star join (TPC-H Q5 shape) ----
    Q(
      "q14_local_supplier_volume",
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
        val ord = Tables.orders(s, dir)
        val cust = Tables.customer(s, dir)
        val supp = Tables.supplier(s, dir)
        val nat = Tables.nation(s, dir)
        val reg = Tables.region(s, dir)
        // Join strategy picked deliberately, scale-adaptively (r14;
        // guide §3.1): when the orders side's plan-stat size fits the
        // session broadcast threshold (it is pruned to two bigint key
        // columns), leave the join unhinted so the planner broadcasts
        // it — the lineitem side is then NOT shuffled at all (two
        // Exchanges gone at bench scale). Past the threshold (sf0.4+,
        // and any production corpus) the fact-fact SHUFFLE_HASH hint
        // applies exactly as before: both sides shuffle either way and
        // it skips sort-merge's two per-partition sorts (AQE still
        // splits skew). The threshold read is the same size logic the
        // planner itself applies — no hard-coded local constant.
        li.join({
          // Parse like Spark's own ConfigHelpers.byteFromString: strip a
          // leading '-' before byteStringAsBytes (which cannot parse
          // negatives) and re-apply the sign — "-1", the standard way to
          // DISABLE auto-broadcast, must select the SHUFFLE_HASH hint,
          // not throw NumberFormatException (r14 ADVICE). Any other
          // unparsable value degrades to the hint too (never aborts).
          val raw = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
          val thr = scala.util.Try {
            val neg = raw.startsWith("-")
            val mag = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
              if (neg) raw.substring(1) else raw)
            if (neg) -mag else mag
          }.getOrElse(-1L)
          val fits = thr > 0 &&
            ord.queryExecution.optimizedPlan.stats.sizeInBytes <= thr
          if (fits) ord else ord.hint("SHUFFLE_HASH")
        }, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
          .filter($"c_nationkey" === $"s_nationkey")
          .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"r_name", $"n_name")
      },
      Some("""SELECT r_name, n_name,
             |round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
             |count(*) AS n_items
             |FROM lineitem, orders, customer, supplier, nation, region
             |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             |AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin),
      bench = true),

    // ---- CASE buckets (P7 conditional projection) ----
    Q(
      "q15_quantity_buckets",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .select(
            when($"l_quantity" < 10, "small")
              .when($"l_quantity" < 30, "medium")
              .otherwise("large").as("bucket"),
            $"l_extendedprice")
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"), round(avg($"l_extendedprice"), 4).as("avg_price"))
          .orderBy($"bucket")
      },
      Some("""SELECT CASE WHEN l_quantity < 10 THEN 'small'
             |WHEN l_quantity < 30 THEN 'medium' ELSE 'large' END AS bucket,
             |count(*) AS n, round(avg(l_extendedprice),4) AS avg_price
             |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ---- Calendar rollup on order dates (O1 sort + date functions) ----
    Q(
      "q16_monthly_revenue",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .groupBy(year($"o_orderdate").cast("long").as("yr"),
            month($"o_orderdate").cast("long").as("mo"))
          .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("revenue"))
          .orderBy($"yr", $"mo")
      },
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             |CAST(month(o_orderdate) AS BIGINT) AS mo,
             |count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue
             |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin)),

    // ---- Full multi-key sort of a small dimension (O1) ----
    Q(
      "q17_supplier_ranking",
      (s, dir) => {
        import s.implicits._
        Tables.supplier(s, dir)
          .select($"s_suppkey", $"s_name", $"s_nationkey".cast("long").as("s_nationkey"),
            round($"s_acctbal", 2).as("s_acctbal"))
          .orderBy(desc("s_acctbal"), $"s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey,
             |round(s_acctbal,2) AS s_acctbal
             |FROM supplier ORDER BY s_acctbal DESC, s_suppkey""".stripMargin)),

    // ---- Salted skew-join: result must equal the plain equi-join ----
    Q(
      "q19_salted_join",
      (s, dir) => {
        import s.implicits._
        graft.operators.SkewJoin.saltedEquiJoin(
          Tables.lineitem(s, dir).select($"l_orderkey", $"l_linenumber", $"l_quantity"),
          Tables.orders(s, dir).select($"o_orderkey", $"o_orderpriority"),
          "l_orderkey", "o_orderkey", nSalts = 8)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity),2) AS qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- Bucketed co-located join: pre-shuffled layout, no Exchange ----
    // Same aggregation (and oracle) as q19, but through Bucketing
    // .writeBucketed: both fact tables are hash-bucketed on orderkey at
    // write time, so the join itself plans with ZERO Exchange (asserted
    // in BucketingSpec) — the 100 TB repeated-join path. The 5-row
    // result is materialized so the scratch tables can be dropped before
    // returning.
    Q(
      "q20_bucketed_join",
      (s, dir) => {
        import s.implicits._
        val id = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
        val (lt, ot) = (s"graft_li_$id", s"graft_or_$id")
        try {
          graft.operators.Bucketing.writeBucketed(
            Tables.lineitem(s, dir).select($"l_orderkey", $"l_linenumber", $"l_quantity"),
            lt, 8, Seq("l_orderkey"))
          graft.operators.Bucketing.writeBucketed(
            Tables.orders(s, dir).select($"o_orderkey", $"o_orderpriority"),
            ot, 8, Seq("o_orderkey"))
          val rows = s.table(lt)
            .join(s.table(ot), $"l_orderkey" === $"o_orderkey")
            .groupBy($"o_orderpriority")
            .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
            .orderBy($"o_orderpriority")
            // collect-bound: model: grouped by o_orderpriority (5-value domain)
            .as[(String, Long, Double)].collect().toSeq
          rows.toDF("o_orderpriority", "n", "qty")
        } finally {
          s.sql(s"DROP TABLE IF EXISTS $lt")
          s.sql(s"DROP TABLE IF EXISTS $ot")
        }
      },
      Some("""SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity),2) AS qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- Rolling window aggregation over event time (running sums) ----
    Q(
      "q18_user_running_value",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables.events(s, dir)
          .filter($"user_id" < 20)
          .withColumn("running_value", round(sum($"value").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
          .select($"user_id", $"event_id", $"running_value")
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
             |round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_value
             |FROM events WHERE user_id < 20
             |ORDER BY user_id, event_id""".stripMargin)),

    // ---- Multi-level aggregation (ROLLUP) ----
    // Subtotals + grand total in ONE pass: Catalyst plans rollup as a
    // single Expand + hash-aggregate (with map-side partial agg), not
    // one job per level. Group keys are coalesced to a sentinel and the
    // standard GROUPING bit-vector is emitted so the result is
    // deterministic and null-free for cross-engine comparison.
    Q(
      "q23_rollup",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(
            grouping_id().cast("int").as("gid"),
            round(sum($"l_quantity"), 2).as("sum_qty"),
            sum($"l_extendedprice".cast("decimal(14,2)") *
              (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(3,2)")))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("n"))
          .select(
            coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
            coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
            $"gid", $"sum_qty", $"sum_disc_price", $"n")
          .orderBy($"gid", $"returnflag", $"linestatus")
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |coalesce(l_linestatus, 'ALL') AS linestatus,
             |CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
             |round(sum(l_quantity), 2) AS sum_qty,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
             |count(*) AS n
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY gid, returnflag, linestatus""".stripMargin)),

    // ---- Semi-structured extraction (JSON property column) ----
    // `get_json_object` is a codegen'd per-row path evaluation — a
    // narrow map feeding the usual partial-aggregated groupBy, exactly
    // how a props/payload column is consumed at 100 TB. The oracle
    // parses the same field with an engine-neutral regexp so the gate
    // does not depend on DuckDB's JSON extension.
    Q(
      "q25_json_props",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .select($"event_type",
            get_json_object($"props", "$.k").cast("long").as("k"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), min($"k").as("min_k"),
            max($"k").as("max_k"), round(avg($"k"), 4).as("avg_k"),
            sum(when($"k" >= 50, 1L).otherwise(0L)).as("n_high"))
          .orderBy($"event_type")
      },
      Some("""WITH e AS (SELECT event_type,
             |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
             |  FROM events)
             |SELECT event_type, count(*) AS n, min(k) AS min_k,
             |max(k) AS max_k, round(avg(k), 4) AS avg_k,
             |count(*) FILTER (k >= 50) AS n_high
             |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- Statistical aggregates (corr / stddev / covar) ----
    // All four are single-pass partially-aggregatable moments — one
    // shuffle of constant-size state per group, any input size.
    Q(
      "q26_stat_aggregates",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .groupBy($"l_returnflag")
          .agg(
            round(corr($"l_quantity", $"l_extendedprice"), 6).as("qty_price_corr"),
            round(stddev_samp($"l_quantity"), 6).as("qty_stddev"),
            round(covar_samp($"l_quantity", $"l_extendedprice"), 2).as("qty_price_covar"),
            round(var_samp($"l_discount"), 8).as("disc_var"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
             |round(stddev_samp(l_quantity), 6) AS qty_stddev,
             |round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
             |round(var_samp(l_discount), 8) AS disc_var
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---- Distribution windows (ntile / percent_rank / cume_dist) ----
    // Per-segment balance percentiles: windows partitioned by segment
    // (one shuffle), unique (acctbal, custkey) ordering for
    // deterministic tie-free ranks; the custkey slice is applied AFTER
    // the windows so ranks reflect the full population.
    Q(
      "q28_balance_deciles",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"c_mktsegment")
          .orderBy($"c_acctbal", $"c_custkey")
        Tables.customer(s, dir)
          .select($"c_custkey", $"c_mktsegment",
            ntile(10).over(w).as("decile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .filter($"c_custkey" < 500)
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment, decile, pct_rank, cume FROM (
             |  SELECT c_custkey, c_mktsegment,
             |    ntile(10) OVER w AS decile,
             |    round(percent_rank() OVER w, 6) AS pct_rank,
             |    round(cume_dist() OVER w, 6) AS cume
             |  FROM customer
             |  WINDOW w AS (PARTITION BY c_mktsegment
             |    ORDER BY c_acctbal, c_custkey))
             |WHERE c_custkey < 500 ORDER BY c_custkey""".stripMargin)),

    // ---- Full outer join (completes the join-type matrix) ----
    // Per-nation customer vs supplier presence: both sides aggregated
    // FIRST (two small per-nation tables), then full-outer joined —
    // pre-aggregation keeps the outer join's null-expansion bounded by
    // |nations|, not |rows|, which is how a reconciliation join should
    // be shaped at any scale.
    Q(
      "q29_nation_presence",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.customer(s, dir)
          .groupBy($"c_nationkey".as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
          .filter($"nationkey" % 3 =!= 0) // force right-only rows
        val supp = Tables.supplier(s, dir)
          .groupBy($"s_nationkey".as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
          .filter($"nationkey" % 4 =!= 0) // force left-only rows
        cust.join(supp, Seq("nationkey"), "full_outer")
          .select($"nationkey",
            coalesce($"n_cust", lit(0L)).as("n_cust"),
            coalesce($"n_supp", lit(0L)).as("n_supp"))
          .orderBy($"nationkey")
      },
      Some("""WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
             |  FROM customer GROUP BY 1 HAVING c_nationkey % 3 <> 0),
             |s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
             |  FROM supplier GROUP BY 1 HAVING s_nationkey % 4 <> 0)
             |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
             |coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
             |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
             |ORDER BY nationkey""".stripMargin)),

    // CUBE over (returnflag, linestatus): all four grouping combinations
    // in ONE Expand + hash-aggregate pass over the scan — the subtotal
    // lattice without re-reading the fact table per level (the rollup
    // q23 pattern completed to the full lattice). Grouped-out cells are
    // pinned to 'ALL' (not NULL) so row identity is total and the
    // grouping bit-vector is emitted for determinism.
    Q(
      "q30_cube",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .cube($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"),
            // exact decimal sum (2-decimal quantities) → double: the
            // grand-total cell sums the whole table, where double
            // summation order is not reproducible across engines.
            sum($"l_quantity".cast("decimal(14,2)"))
              .cast("double").as("sum_qty"),
            // grouping()/grouping_id() are only resolvable inside the
            // cube aggregate itself.
            grouping($"l_returnflag").as("g_rf"),
            grouping($"l_linestatus").as("g_ls"),
            grouping_id().cast("int").as("gid"))
          .select(
            when($"g_rf" === 1, "ALL").otherwise($"l_returnflag").as("returnflag"),
            when($"g_ls" === 1, "ALL").otherwise($"l_linestatus").as("linestatus"),
            $"gid", $"n", $"sum_qty")
          .orderBy($"gid", $"returnflag", $"linestatus")
      },
      Some("""SELECT
             |CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
             |CASE WHEN grouping(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
             |CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER) AS gid,
             |count(*) AS n,
             |CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY gid, returnflag, linestatus""".stripMargin)),

    // ---- Bloom-prefiltered join (runtime-filter / semi-join pushdown) ----
    // The dim side is a selective filter over orders; instead of
    // shuffling ALL of lineitem into the join, a constant-size Bloom
    // bit set built from the dim keys prefilters the fact side at the
    // scan — the hand-rolled form of the runtime row-filters AQE/DPP
    // inject, and the classic 100 TB trick when the dim side is small
    // but past the broadcast-join comfort zone. False positives are
    // eliminated by the real join that follows, so the result is
    // EXACTLY the plain join (which is the oracle).
    Q(
      "q33_bloom_join",
      (s, dir) => {
        import s.implicits._
        import graft.operators.BloomFilter
        val (m, k) = (1 << 14, 3)
        val dim = Tables.orders(s, dir)
          .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 250000.0)
          .select($"o_orderkey", $"o_custkey")
        val words = BloomFilter.bitmap(
          BloomFilter.bitsTable(dim, $"o_orderkey", k, m), m)
        val fact = BloomFilter.mightContain(
          words, Tables.lineitem(s, dir).select($"l_orderkey", $"l_quantity"),
          $"l_orderkey", k, m)
        fact.join(dim, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderkey")
          .agg(count(lit(1)).as("n_items"),
            round(sum($"l_quantity"), 2).as("sum_qty"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, count(*) AS n_items,
             |round(sum(l_quantity), 2) AS sum_qty
             |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000.0
             |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)),

    // ---- Generic column profiler (ANALYZE TABLE / ingestion audit) ----
    // One scan, one aggregate (multi-DISTINCT plans as a single Expand +
    // hash agg), melted to long form with a row-local stack() Generate.
    Q(
      "q34_profile",
      (s, dir) => graft.operators.Profiler.profile(Tables.documents(s, dir)),
      Some {
        val profiled = Seq("doc_id", "lang", "n_chars", "source", "text")
        profiled.map { c =>
          s"""SELECT '$c' AS column_name, count(*) AS n_rows,
             |CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |count(DISTINCT $c) AS n_distinct FROM documents""".stripMargin
        }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY column_name")
      }),

    // ---- The SQL surface itself: spark.sql over registered views ----
    // Everything else in the gate drives the DataFrame API; a user of
    // the engine equally gets ANSI SQL through the same Catalyst
    // planner — CTE, correlated EXISTS (plans as a semi-join), scalar
    // subquery, window function, all in one statement. The oracle is
    // the IDENTICAL text (engine-portable SQL), modulo the view names.
    Q(
      "q35_sql_surface",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        s.sql("""
          WITH spenders AS (
            SELECT o_custkey, count(*) AS n_orders, max(o_totalprice) AS top_price
            FROM orders_v GROUP BY o_custkey)
          SELECT c.c_mktsegment,
                 count(*) AS n_cust,
                 CAST(sum(s.n_orders) AS BIGINT) AS n_orders,
                 CAST(sum(CASE WHEN s.top_price >
                   (SELECT max(o_totalprice) FROM orders_v) * 0.5
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_above_half_max
          FROM customer_v c JOIN spenders s ON s.o_custkey = c.c_custkey
          WHERE EXISTS (SELECT 1 FROM orders_v o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')
          GROUP BY c.c_mktsegment
          ORDER BY c_mktsegment""")
      },
      Some("""WITH spenders AS (
             |  SELECT o_custkey, count(*) AS n_orders, max(o_totalprice) AS top_price
             |  FROM orders GROUP BY o_custkey)
             |SELECT c.c_mktsegment,
             |       count(*) AS n_cust,
             |       CAST(sum(s.n_orders) AS BIGINT) AS n_orders,
             |       CAST(sum(CASE WHEN s.top_price >
             |         (SELECT max(o_totalprice) FROM orders) * 0.5
             |         THEN 1 ELSE 0 END) AS BIGINT) AS n_above_half_max
             |FROM customer c JOIN spenders s ON s.o_custkey = c.c_custkey
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_orderpriority = '1-URGENT')
             |GROUP BY c.c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // GROUPING SETS — the general form cube/rollup specialize: an
    // ARBITRARY list of grouping combinations (here the two one-dim
    // marginals + grand total, NOT the full 2^k lattice a cube would
    // compute) in one Expand + hash-aggregate pass over one scan.
    // Completes the subtotal family q23 (rollup) / q30 (cube) started.
    Q(
      "q36_grouping_sets",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .groupingSets(
            Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq.empty),
            $"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"),
            sum($"l_quantity".cast("decimal(14,2)"))
              .cast("double").as("sum_qty"),
            grouping($"l_returnflag").as("g_rf"),
            grouping($"l_linestatus").as("g_ls"),
            grouping_id().cast("int").as("gid"))
          .select(
            when($"g_rf" === 1, "ALL").otherwise($"l_returnflag").as("returnflag"),
            when($"g_ls" === 1, "ALL").otherwise($"l_linestatus").as("linestatus"),
            $"gid", $"n", $"sum_qty")
          .orderBy($"gid", $"returnflag", $"linestatus")
      },
      Some("""SELECT
             |CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
             |CASE WHEN grouping(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
             |CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER) AS gid,
             |count(*) AS n,
             |CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY gid, returnflag, linestatus""".stripMargin)),

    // Z-order (Morton) layout key: interleave the bits of two columns
    // so that sorting by the ONE key keeps rows clustered in BOTH
    // dimensions — per-file min/max stats then prune scans filtering
    // on either column (the Delta/Iceberg OPTIMIZE ZORDER idea). The
    // key is pure codegen'd shift/mask/add arithmetic (narrow map, no
    // shuffle); the query groups rows into z-curve tiles and shows the
    // locality directly: each tile's min/max range is narrow in BOTH
    // x (partkey) and y (quantized price), which is exactly the file-
    // level statistics a clustered write would produce. The oracle
    // replays the 32-term interleave with the same power-of-two
    // constants — all-integer, hash-exact.
    Q(
      "q37_zorder_cluster",
      (s, dir) => {
        import s.implicits._
        val x = $"l_partkey".bitwiseAND(lit(65535L))
        val y = floor($"l_extendedprice" / lit(16.0)).cast("long")
          .bitwiseAND(lit(65535L))
        Tables.lineitem(s, dir)
          .select(graft.operators.Layout.zorder16(x, y).as("zval"),
            x.as("x"), y.as("y"))
          .groupBy(shiftright($"zval", 20).as("tile"))
          .agg(count(lit(1)).as("n"),
            min($"x").as("x_min"), max($"x").as("x_max"),
            min($"y").as("y_min"), max($"y").as("y_max"))
          .orderBy($"tile")
      },
      Some(q37OracleSql)),

    // Ordered funnel view -> click -> purchase: per user, the earliest
    // view, the earliest click STRICTLY AFTER it, the earliest purchase
    // after that — sequencing via min(CASE WHEN ts > t_prev), one
    // per-user hash agg per step, no windows or per-user sorts. Users
    // who stall keep nulls (left joins), so step conversion is a null
    // count downstream. The frontier table after step 1 has one row
    // per entered user — later joins are frontier-sized, not
    // corpus-sized.
    Q(
      "q38_funnel",
      (s, dir) => {
        import s.implicits._
        graft.operators.Behavior.funnel(Tables.events(s, dir),
          "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
          .orderBy($"user_id")
      },
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |s2 AS (SELECT s1.user_id, t1,
             |  min(CASE WHEN e.ts > t1 THEN e.ts END) AS t2
             |  FROM s1 LEFT JOIN events e
             |    ON e.user_id = s1.user_id AND e.event_type = 'click'
             |  GROUP BY s1.user_id, t1),
             |s3 AS (SELECT s2.user_id, t1, t2,
             |  min(CASE WHEN e.ts > t2 THEN e.ts END) AS t3
             |  FROM s2 LEFT JOIN events e
             |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
             |  GROUP BY s2.user_id, t1, t2)
             |SELECT user_id, t1, t2, t3 FROM s3 ORDER BY user_id""".stripMargin)),

    // Cohort retention: cohort = day of a user's first event; cell
    // (cohort, offset) counts members active offset days later. Two
    // per-user hash aggregations joined on user + one (cohort, offset)
    // count — integer/date arithmetic only, no windows, no floats.
    Q(
      "q39_retention",
      (s, dir) => {
        import s.implicits._
        graft.operators.Behavior.retention(Tables.events(s, dir),
          "user_id", "ts", maxOffsetDays = 14)
          .orderBy($"cohort_day", $"offset")
      },
      Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
             |  FROM events GROUP BY user_id),
             |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |j AS (SELECT f.user_id, cohort_day,
             |  date_diff('day', cohort_day, day) AS "offset"
             |  FROM f JOIN a ON a.user_id = f.user_id)
             |SELECT cohort_day, CAST("offset" AS BIGINT) AS "offset",
             |count(DISTINCT user_id) AS n_users
             |FROM j WHERE "offset" <= 14
             |GROUP BY cohort_day, "offset" ORDER BY cohort_day, "offset"""".stripMargin)),

    // Per-group OLS trend over daily event counts: every moment sum
    // (Σx, Σy, Σxy, Σx²) is an exact INTEGER aggregation — one hash
    // agg with map-side combine, order-independent however the events
    // are partitioned — and the only float math is the two closed-form
    // divisions per group (6dp-rounded), so slope/intercept hash-match
    // the oracle exactly where a float covariance accumulation would
    // not. Degenerate groups yield nulls, not ±Inf.
    Q(
      "q40_daily_trend",
      (s, dir) => {
        import s.implicits._
        val daily = Tables.events(s, dir)
          .groupBy($"event_type",
            datediff(to_date($"ts"), to_date(lit("1970-01-01"))).as("x"))
          .agg(count(lit(1)).as("y"))
        graft.operators.Stats.olsTrend(daily, "event_type", $"x", $"y")
          .orderBy($"event_type")
      },
      Some("""WITH d AS (SELECT event_type,
             |  date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             |  count(*) AS y
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT event_type, count(*) AS n,
             |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |  CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx
             |  FROM d GROUP BY 1),
             |t AS (SELECT event_type, n, n*sxx - sx*sx AS det,
             |  sx, sy, sxy, sxx FROM m)
             |SELECT event_type, n,
             |CASE WHEN det <> 0
             |  THEN round(CAST(n*sxy - sx*sy AS DOUBLE) / det, 6) END AS slope,
             |CASE WHEN det <> 0
             |  THEN round(CAST(sy*sxx - sx*sxy AS DOUBLE) / det, 6) END AS intercept
             |FROM t ORDER BY event_type""".stripMargin)),

    // Dense hourly series with gap-fill: the per-group hour range is
    // exploded from a sequence() (a narrow generate over the TINY
    // per-group bounds table — one row per event_type, never the
    // corpus), then left-joined back so missing hours surface as
    // explicit zeros. The standard shape for resampling at scale:
    // bounds-aggregate, generate, join on (group, slot).
    Q(
      "q41_hourly_gapfill",
      (s, dir) => {
        import s.implicits._
        val hourly = Tables.events(s, dir)
          .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
          .agg(count(lit(1)).as("n"))
        val dense = hourly.groupBy($"event_type")
          .agg(min($"hour").as("h0"), max($"hour").as("h1"))
          .select($"event_type",
            explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
        dense.join(hourly, Seq("event_type", "hour"), "left")
          .select($"event_type", $"hour", coalesce($"n", lit(0L)).as("n"))
          .orderBy($"event_type", $"hour")
      },
      Some("""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
             |  count(*) AS n FROM events GROUP BY 1, 2),
             |b AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1
             |  FROM h GROUP BY 1),
             |dense AS (SELECT event_type,
             |  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b)
             |SELECT d.event_type, d.hour, coalesce(n, 0) AS n
             |FROM dense d LEFT JOIN h
             |  ON h.event_type = d.event_type AND h.hour = d.hour
             |ORDER BY d.event_type, d.hour""".stripMargin)),

    // Robust per-group outlier detection: median and MAD (median
    // absolute deviation) are ORDER STATISTICS — exact selection over
    // the group's values, no floating accumulation anywhere — so they
    // are deterministic under any partitioning (unlike mean/stddev of
    // doubles). Two grouped sort-aggs + one broadcast-size join of the
    // per-group stats back onto the facts; outlier = |x − med| > 3·MAD.
    Q(
      "q43_mad_outliers",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir).select($"event_type", $"value")
        val med = ev.groupBy($"event_type")
          .agg(expr("percentile(value, 0.5)").as("med"),
            count(lit(1)).as("n"))
        val mad = ev.join(broadcast(med), Seq("event_type"))
          .groupBy($"event_type")
          .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
        val stats = med.join(mad, Seq("event_type"))
        ev.join(broadcast(stats), Seq("event_type"))
          .groupBy($"event_type")
          .agg(first($"n").as("n"),
            round(first($"med"), 6).as("med"),
            round(first($"mad"), 6).as("mad"),
            sum(when(abs($"value" - $"med") > lit(3.0) * $"mad", 1L)
              .otherwise(0L)).as("n_outliers"))
          .orderBy($"event_type")
      },
      Some("""WITH med AS (SELECT event_type,
             |  quantile_cont(value, 0.5) AS med, count(*) AS n
             |  FROM events GROUP BY 1),
             |mad AS (SELECT e.event_type,
             |  quantile_cont(abs(value - med), 0.5) AS mad
             |  FROM events e JOIN med USING (event_type) GROUP BY 1)
             |SELECT e.event_type, any_value(n) AS n,
             |round(any_value(med), 6) AS med,
             |round(any_value(mad), 6) AS mad,
             |CAST(count(*) FILTER (abs(value - med) > 3.0 * mad) AS BIGINT)
             |  AS n_outliers
             |FROM events e JOIN med USING (event_type)
             |  JOIN mad USING (event_type)
             |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)),

    // Last-observation-carried-forward over the dense hourly grid:
    // q41's gap-fill leaves empty hours null, then one window pass
    // per group forward-fills with `last(_, ignoreNulls)` — the
    // standard sensor/feature resampling shape. The per-hour value is
    // max(value) (an order-independent selection), NOT a float sum,
    // so the filled series hash-matches across engines.
    Q(
      "q44_hourly_locf",
      (s, dir) => {
        import s.implicits._
        val hourly = Tables.events(s, dir)
          .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
          .agg(max($"value").as("v"))
        val dense = hourly.groupBy($"event_type")
          .agg(min($"hour").as("h0"), max($"hour").as("h1"))
          .select($"event_type",
            explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
        val w = Window.partitionBy($"event_type").orderBy($"hour")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        dense.join(hourly, Seq("event_type", "hour"), "left")
          .select($"event_type", $"hour",
            round(last($"v", ignoreNulls = true).over(w), 6).as("filled"))
          .orderBy($"event_type", $"hour")
      },
      Some("""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
             |  max(value) AS v FROM events GROUP BY 1, 2),
             |b AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1
             |  FROM h GROUP BY 1),
             |dense AS (SELECT event_type,
             |  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
             |g AS (SELECT d.event_type, d.hour, v
             |  FROM dense d LEFT JOIN h
             |    ON h.event_type = d.event_type AND h.hour = d.hour)
             |SELECT event_type, hour,
             |round(last_value(v IGNORE NULLS) OVER (
             |  PARTITION BY event_type ORDER BY hour
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled
             |FROM g ORDER BY event_type, hour""".stripMargin)),

    // TPC-H Q17 semantics (small-quantity revenue): lineitems whose
    // quantity falls below 20% of their part's average, summed per
    // brand. The correlated scalar subquery becomes ONE per-part
    // aggregate joined back — the per-part avg table is |parts|-sized
    // and co-partitions with the fact on l_partkey; the brand dim
    // broadcasts. DECIMAL-exact sum so partition order cannot flip
    // the money total.
    Q(
      "q53_small_qty_revenue",
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
        // exact decimal sum / count, cast late: a double avg would be
        // partition-order-dependent at the 0.2*aq filter boundary
        val avgQ = li.groupBy($"l_partkey")
          .agg((sum($"l_quantity".cast("decimal(14,2)")).cast("double")
            / count(lit(1))).as("aq"))
        li.join(avgQ, Seq("l_partkey"))
          .filter($"l_quantity" < lit(0.2) * $"aq")
          .join(broadcast(Tables.part(s, dir)
            .select($"p_partkey", $"p_brand")),
            $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n_items"),
            round(sum($"l_extendedprice".cast("decimal(14,2)"))
              .cast("double") / 7.0, 2).as("avg_yearly"))
          .orderBy($"p_brand")
      },
      Some("""WITH aq AS (SELECT l_partkey,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE)
             |    / count(*) AS aq
             |  FROM lineitem GROUP BY l_partkey)
             |SELECT p_brand, count(*) AS n_items,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)))
             |    AS DOUBLE) / 7.0, 2) AS avg_yearly
             |FROM lineitem
             |JOIN aq USING (l_partkey)
             |JOIN part ON p_partkey = l_partkey
             |WHERE l_quantity < 0.2 * aq
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // TPC-H Q18 semantics (large-volume orders): orders whose total
    // line quantity exceeds a threshold, with customer recovery. The
    // HAVING-subquery becomes one fact aggregate -> selective
    // semi-side, then two key joins; at scale the aggregate output is
    // the small side and broadcasts into the recovery joins.
    Q(
      "q54_large_orders",
      (s, dir) => {
        import s.implicits._
        val big = Tables.lineitem(s, dir)
          .groupBy($"l_orderkey")
          .agg(sum($"l_quantity".cast("decimal(14,2)")).as("total_qty"))
          .filter($"total_qty" > 180)
        Tables.orders(s, dir)
          .join(big, $"o_orderkey" === $"l_orderkey")
          .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
          .select($"c_custkey", $"c_name", $"o_orderkey",
            $"o_orderdate", $"o_totalprice",
            $"total_qty".cast("double").as("total_qty"))
          .orderBy($"o_totalprice".desc, $"o_orderkey")
      },
      Some("""WITH big AS (SELECT l_orderkey,
             |  sum(CAST(l_quantity AS DECIMAL(14,2))) AS total_qty
             |  FROM lineitem GROUP BY l_orderkey
             |  HAVING sum(CAST(l_quantity AS DECIMAL(14,2))) > 180)
             |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
             |  o_totalprice, CAST(total_qty AS DOUBLE) AS total_qty
             |FROM orders
             |JOIN big ON o_orderkey = l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin)),

    // TPC-H Q4 semantics (order-priority checking): orders in one
    // quarter with at least one LATE lineitem (shipped more than 90
    // days after the order date — the schema's proxy for commit <
    // receipt), counted per priority. The EXISTS becomes a LEFT SEMI
    // join whose condition mixes the equi key with a cross-table date
    // inequality — the key still drives the shuffle, the inequality
    // evaluates post-match, so the plan stays a hash semi-join.
    Q(
      "q55_priority_late_orders",
      (s, dir) => {
        import s.implicits._
        val ord = Tables.orders(s, dir)
          .filter($"o_orderdate" >= lit("1998-01-01 00:00:00")
            .cast("timestamp") &&
            $"o_orderdate" < lit("1998-04-01 00:00:00").cast("timestamp"))
        val li = Tables.lineitem(s, dir)
          .select($"l_orderkey", $"l_shipdate")
        ord.join(li, $"o_orderkey" === $"l_orderkey" &&
            $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"),
            "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1998-04-01 00:00:00'
             |AND EXISTS (SELECT 1 FROM lineitem
             |  WHERE l_orderkey = o_orderkey
             |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // Correlated above-group-average (q56) — the classic decorrelation
    // shape: customers richer than their own nation's mean balance.
    // The correlated scalar subquery becomes ONE per-nation aggregate
    // (exact decimal sum / count — a double avg would be
    // partition-order-dependent at the comparison boundary) broadcast
    // back into the filter; reported per nation.
    Q(
      "q56_above_nation_avg",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.customer(s, dir)
        val na = cust.groupBy($"c_nationkey")
          .agg((sum($"c_acctbal".cast("decimal(14,2)")).cast("double")
            / count(lit(1))).as("nav"))
        cust.join(broadcast(na), Seq("c_nationkey"))
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n_total"),
            count(when($"c_acctbal" > $"nav", 1)).as("n_above"),
            round(max($"nav"), 4).as("nation_avg"))
          .select($"c_nationkey", $"n_total", $"n_above", $"nation_avg",
            round($"n_above" * 1.0 / $"n_total", 6).as("frac_above"))
          .orderBy($"c_nationkey")
      },
      Some("""WITH na AS (SELECT c_nationkey,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
             |    / count(*) AS nav
             |  FROM customer GROUP BY c_nationkey)
             |SELECT c.c_nationkey, count(*) AS n_total,
             |  CAST(count(CASE WHEN c.c_acctbal > na.nav THEN 1 END)
             |    AS BIGINT) AS n_above,
             |  round(max(na.nav), 4) AS nation_avg,
             |  round(count(CASE WHEN c.c_acctbal > na.nav THEN 1 END)
             |    * 1.0 / count(*), 6) AS frac_above
             |FROM customer c JOIN na USING (c_nationkey)
             |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin))
  )

  /** q37 oracle: the 32-term Morton interleave with literal power-of-
    * two constants (bit i of x at 2i, bit i of y at 2i+1), matching
    * [[graft.operators.Layout.zorder16]] term for term.
    */
  private lazy val q37OracleSql: String = {
    val terms = (0 until 16).flatMap(i => Seq(
      s"((x >> $i) & 1) * ${1L << (2 * i)}",
      s"((y >> $i) & 1) * ${1L << (2 * i + 1)}"))
      .mkString(" + ")
    s"""WITH b AS (SELECT (l_partkey & 65535) AS x,
       |  (CAST(floor(l_extendedprice / 16.0::DOUBLE) AS BIGINT) & 65535) AS y
       |  FROM lineitem),
       |z AS (SELECT x, y, ($terms) AS zval FROM b)
       |SELECT zval >> 20 AS tile, count(*) AS n,
       |min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
       |FROM z GROUP BY tile ORDER BY tile""".stripMargin
  }
}
