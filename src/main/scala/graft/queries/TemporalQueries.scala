package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, RangeJoin}
import graft.tables.Tables

/** Temporal join operators over the event/order streams: backward as-of
  * join (q21) and bucketized interval join (q22). Both oracles use an
  * INDEPENDENT formulation (pair-explosion + QUALIFY top-1, and a plain
  * range-predicate join DuckDB plans as IEJoin) so the gate checks the
  * semantics, not a re-implementation of the same plan.
  */
object TemporalQueries extends QueryProvider {

  override val all: Seq[Q] = Seq(

    // For every click, the latest at-or-before purchase by the same
    // user (ties at equal ts → greatest event_id). Clicks with no prior
    // purchase survive with nulls — the left join semantics.
    Q(
      "q21_asof_join",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
        val clicks = ev.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts", $"value")
        AsofJoin.asofBackward(
          clicks, purchases,
          leftKey = "user_id", rightKey = "user_id",
          leftTime = "ts", rightTime = "ts",
          payload = Seq("event_id", "value"), rightTie = "event_id")
          .select($"event_id", $"user_id",
            $"asof_event_id", round($"asof_value", 6).as("asof_value"))
          .orderBy($"event_id")
      },
      Some("""SELECT c.event_id, c.user_id,
             |  p.event_id AS asof_event_id, round(p.value, 6) AS asof_value
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON p.user_id = c.user_id AND p.ts <= c.ts
             |QUALIFY row_number() OVER (PARTITION BY c.event_id
             |  ORDER BY p.ts DESC NULLS LAST, p.event_id DESC NULLS LAST) = 1
             |ORDER BY c.event_id""".stripMargin)),

    // Pure range join (no equality key): per urgent order, lineitems —
    // of ANY order — shipped within [orderdate, orderdate + 7 days).
    // The engine buckets the time axis at the interval width, so the
    // join is a shuffled equi-join on bucket id; the oracle states the
    // range predicate directly.
    Q(
      "q22_range_join",
      (s, dir) => {
        import s.implicits._
        val iv = Tables.orders(s, dir)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_orderkey",
            unix_timestamp($"o_orderdate").as("lo"),
            (unix_timestamp($"o_orderdate") + lit(7L * 86400)).as("hi"))
        val pts = Tables.lineitem(s, dir)
          .select($"l_quantity", unix_timestamp($"l_shipdate").as("pt"))
        RangeJoin.intervalJoin(iv, "lo", "hi", pts, "pt",
          bucketWidth = 7L * 86400)
          .groupBy($"o_orderkey")
          .agg(count(lit(1)).as("n_items"),
            round(sum($"l_quantity"), 2).as("sum_qty"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o.o_orderkey, count(*) AS n_items,
             |  round(sum(l.l_quantity), 2) AS sum_qty
             |FROM orders o JOIN lineitem l
             |  ON l.l_shipdate >= o.o_orderdate
             | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
             |WHERE o.o_orderpriority = '1-URGENT'
             |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin)),

    // Batch gap-based sessionization — the classic lag→break→cumsum
    // pattern: a new session starts when the gap to the previous event
    // of the same user exceeds 30 minutes. Both windows are PARTITIONED
    // BY user_id (one shuffle, no global window), so at 100 TB the plan
    // is a single hash-shuffle followed by narrow per-user sorted scans;
    // the streaming twin with true incremental state is sm02.
    Q(
      "q24_sessionize",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        val gapUs = 30L * 60 * 1000000
        Tables.events(s, dir)
          .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"), $"value")
          .withColumn("brk",
            when(lag($"ts_us", 1).over(w).isNull ||
              $"ts_us" - lag($"ts_us", 1).over(w) > gapUs, 1).otherwise(0))
          .withColumn("sid", sum($"brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"sid")
          .agg(count(lit(1)).as("n_events"),
            min($"ts_us").as("start_us"), max($"ts_us").as("end_us"),
            round(sum($"value"), 2).as("total_value"))
          .orderBy($"user_id", $"sid")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
             |  FROM events),
             |s AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
             |    OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
             |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
             |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM s)
             |SELECT user_id, CAST(sid AS BIGINT) AS sid, count(*) AS n_events,
             |min(ts_us) AS start_us, max(ts_us) AS end_us,
             |round(sum(value), 2) AS total_value
             |FROM g GROUP BY user_id, sid
             |ORDER BY user_id, sid""".stripMargin),
      bench = true),

    // Clickstream path mining: the most common 3-step event-type paths
    // WITHIN q24's sessions. Both leads come off the ONE
    // (user, session)-partitioned sort (the q31/d14 shared-window
    // discipline — leads cannot cross a session because the session id
    // is in the partition key), then a global count + top-20. At scale
    // the heavy stage is the same single sessionize shuffle q24 pays;
    // the trigram count is corpus-wide but combines map-side.
    Q(
      "q45_session_paths",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        val gapUs = 30L * 60 * 1000000
        val sess = Tables.events(s, dir)
          .select($"user_id", $"event_id", $"event_type",
            unix_micros($"ts").as("ts_us"))
          .withColumn("brk",
            when(lag($"ts_us", 1).over(w).isNull ||
              $"ts_us" - lag($"ts_us", 1).over(w) > gapUs, 1).otherwise(0))
          .withColumn("sid", sum($"brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val ws = Window.partitionBy($"user_id", $"sid")
          .orderBy($"ts_us", $"event_id")
        sess
          .withColumn("e2", lead($"event_type", 1).over(ws))
          .withColumn("e3", lead($"event_type", 2).over(ws))
          .filter($"e2".isNotNull && $"e3".isNotNull)
          .select(concat_ws(">", $"event_type", $"e2", $"e3").as("path"))
          .groupBy($"path").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), $"path").limit(20)
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |  epoch_us(ts) AS ts_us FROM events),
             |s AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
             |    OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
             |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
             |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM s),
             |t AS (SELECT event_type,
             |    lead(event_type, 1) OVER ws AS e2,
             |    lead(event_type, 2) OVER ws AS e3
             |  FROM g WINDOW ws AS (PARTITION BY user_id, sid
             |    ORDER BY ts_us, event_id)),
             |p AS (SELECT event_type || '>' || e2 || '>' || e3 AS path FROM t
             |  WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
             |SELECT path, CAST(count(*) AS BIGINT) AS cnt FROM p
             |GROUP BY path ORDER BY cnt DESC, path LIMIT 20""".stripMargin)),

    // Incremental aggregate maintenance: the hourly rollup computed as
    // BASE PARTIALS + DELTA PARTIALS merged (the nightly-table +
    // late-batch pattern), gated against an oracle that aggregates
    // DIRECTLY — the hash match IS the proof that the merge of partial
    // states equals the one-shot aggregate (counts/sums are mergeable;
    // 2dp rounding absorbs the one extra float association the merge
    // introduces). At scale the base partials are the stored agg table
    // — the delta pass touches only the new batch.
    Q(
      "q46_incremental_agg",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select(date_trunc("hour", $"ts").as("hour"), $"event_type",
            $"value", $"event_id")
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy($"hour", $"event_type")
            .agg(count(lit(1)).as("n"), sum($"value").as("sv"))
        partial(ev.filter($"event_id" % 10 =!= 9))
          .unionByName(partial(ev.filter($"event_id" % 10 === 9)))
          .groupBy($"hour", $"event_type")
          .agg(sum($"n").as("n"), round(sum($"sv"), 2).as("sum_value"))
          .orderBy($"hour", $"event_type")
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             |count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1, 2
             |ORDER BY hour, event_type""".stripMargin)),

    // Rolling 7-day active users (WAU per day) in the SCALABLE
    // formulation: instead of a per-day distinct-count window (whose
    // state is the full user set per frame), each (user, active-day)
    // pair fans out to the ≤7 report days it supports — a constant-7
    // Generate — and the report is one distinct-count hash agg per
    // day. Report days are the days that actually have events.
    Q(
      "q47_rolling_wau",
      (s, dir) => {
        import s.implicits._
        val ud = Tables.events(s, dir)
          .select($"user_id", to_date($"ts").as("day")).distinct()
        val expanded = ud
          .select($"user_id", explode(sequence(lit(0), lit(6))).as("i"),
            $"day")
          .select($"user_id", expr("date_add(day, i)").as("rday"))
        val reportDays = ud.select($"day".as("rday")).distinct()
        expanded.join(reportDays, Seq("rday"))
          .groupBy($"rday")
          .agg(countDistinct($"user_id").as("wau"))
          .select($"rday".cast("string").as("day"), $"wau")
          .orderBy($"day")
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
             |ex AS (SELECT user_id, day + CAST(i AS INTEGER) AS rday
             |  FROM ud, unnest(range(7)) AS t(i)),
             |rd AS (SELECT DISTINCT day AS rday FROM ud)
             |SELECT rday::VARCHAR AS day,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS wau
             |FROM ex JOIN rd USING (rday)
             |GROUP BY rday ORDER BY day""".stripMargin)),

    // Referential-integrity audit — the schema-contract check a
    // warehouse runs after every load: per foreign-key relationship,
    // total child rows and ORPHANS (children whose key misses the
    // parent). Each relationship is one LEFT ANTI join against the
    // parent's (distinct, broadcastable) key column — never a full
    // parent scan per child row — and the seven audits union into one
    // report. The gate proves all counts, orphans included (zero on
    // this generator, which is itself the assertion).
    Q(
      "q48_fk_audit",
      (s, dir) => {
        import s.implicits._
        def audit(name: String, child: org.apache.spark.sql.DataFrame,
            ck: String, parent: org.apache.spark.sql.DataFrame,
            pk: String) = {
          val total = child.agg(count(lit(1)).as("n_rows"))
          val orphans = child.select(col(ck))
            .join(broadcast(parent.select(col(pk).as(ck)).distinct()),
              Seq(ck), "left_anti")
            .agg(count(lit(1)).as("n_orphans"))
          total.crossJoin(orphans).select(lit(name).as("fk"),
            col("n_rows"), col("n_orphans"))
        }
        val audits = Seq(
          audit("customer.nation", Tables.customer(s, dir), "c_nationkey",
            Tables.nation(s, dir), "n_nationkey"),
          audit("lineitem.orders", Tables.lineitem(s, dir), "l_orderkey",
            Tables.orders(s, dir), "o_orderkey"),
          audit("lineitem.part", Tables.lineitem(s, dir), "l_partkey",
            Tables.part(s, dir), "p_partkey"),
          audit("lineitem.supplier", Tables.lineitem(s, dir), "l_suppkey",
            Tables.supplier(s, dir), "s_suppkey"),
          audit("nation.region", Tables.nation(s, dir), "n_regionkey",
            Tables.region(s, dir), "r_regionkey"),
          audit("orders.customer", Tables.orders(s, dir), "o_custkey",
            Tables.customer(s, dir), "c_custkey"),
          audit("supplier.nation", Tables.supplier(s, dir), "s_nationkey",
            Tables.nation(s, dir), "n_nationkey"))
        audits.reduce(_.unionByName(_)).orderBy($"fk")
      },
      Some {
        def one(name: String, child: String, ck: String, parent: String,
            pk: String) =
          s"""SELECT '$name' AS fk,
             |  CAST((SELECT count(*) FROM $child) AS BIGINT) AS n_rows,
             |  CAST((SELECT count(*) FROM $child WHERE $ck NOT IN
             |    (SELECT $pk FROM $parent)) AS BIGINT) AS n_orphans"""
            .stripMargin
        Seq(
          one("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey"),
          one("lineitem.orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          one("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
          one("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
          one("nation.region", "nation", "n_regionkey", "region", "r_regionkey"),
          one("orders.customer", "orders", "o_custkey", "customer", "c_custkey"),
          one("supplier.nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
          .mkString("", "\nUNION ALL ", "\nORDER BY fk")
      }),

    // The TPC-H Q2 shape (min-cost supplier per part) DECORRELATED:
    // what the textbook writes as a correlated `WHERE cost = (SELECT
    // min(cost) … WHERE partkey = outer.partkey)` runs here as ONE
    // struct-min hash aggregation — no per-row subquery, no second
    // scan, ties pinned by the (price, suppkey) struct order. The
    // oracle reaches the same rows through a window rank, proving the
    // aggregate and window formulations equal.
    Q(
      "q49_min_cost_supplier",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .select($"l_partkey", $"l_suppkey",
            round($"l_extendedprice", 2).as("price"))
          .groupBy($"l_partkey")
          .agg(min(struct($"price", $"l_suppkey")).as("best"),
            count(lit(1)).as("n_offers"))
          .select($"l_partkey", $"best.price".as("min_price"),
            $"best.l_suppkey".as("l_suppkey"), $"n_offers")
          .orderBy($"l_partkey")
      },
      Some("""WITH o AS (SELECT l_partkey, l_suppkey,
             |  round(l_extendedprice, 2) AS price,
             |  count(*) OVER (PARTITION BY l_partkey) AS n_offers,
             |  row_number() OVER (PARTITION BY l_partkey
             |    ORDER BY round(l_extendedprice, 2), l_suppkey) AS rn
             |  FROM lineitem)
             |SELECT l_partkey, price AS min_price, l_suppkey,
             |  CAST(n_offers AS BIGINT) AS n_offers
             |FROM o WHERE rn = 1 ORDER BY l_partkey""".stripMargin)),

    // Forward as-of: each click's NEXT purchase by the same user (the
    // attribution/conversion-lag direction). Same union-window plan as
    // q21 mirrored; the oracle is the independent pair-explosion top-1.
    Q(
      "q27_asof_forward",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
        val clicks = ev.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts", $"value")
        AsofJoin.asofForward(
          clicks, purchases,
          leftKey = "user_id", rightKey = "user_id",
          leftTime = "ts", rightTime = "ts",
          payload = Seq("event_id", "value"), rightTie = "event_id")
          .select($"event_id", $"user_id",
            $"asof_event_id", round($"asof_value", 6).as("asof_value"))
          .orderBy($"event_id")
      },
      Some("""SELECT c.event_id, c.user_id,
             |  p.event_id AS asof_event_id, round(p.value, 6) AS asof_value
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |QUALIFY row_number() OVER (PARTITION BY c.event_id
             |  ORDER BY p.ts ASC NULLS LAST, p.event_id ASC NULLS LAST) = 1
             |ORDER BY c.event_id""".stripMargin)),

    // Sliding-frame window family: trailing 4-row moving average /
    // peak / trough per user, plus inter-event gap via lag — the
    // rate-smoothing and spike-detection shapes of telemetry pipelines.
    // ALL frames share ONE user-partitioned sort: a single shuffle, and
    // the per-user frames never materialize pair explosions (the frame
    // is a ring buffer inside WindowExec). Bounded to user_id < 100 to
    // keep the gate output small — the plan is scale-free in users.
    Q(
      "q31_moving_window",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts_us", $"event_id")
        val trailing = w.rowsBetween(-3, Window.currentRow)
        Tables.events(s, dir)
          .filter($"user_id" < 100)
          .select($"event_id", $"user_id",
            unix_micros($"ts").as("ts_us"), $"value")
          .select($"event_id", $"user_id", $"ts_us",
            round(avg($"value").over(trailing), 6).as("ma4"),
            round(max($"value").over(trailing), 6).as("peak4"),
            round(min($"value").over(trailing), 6).as("trough4"),
            ($"ts_us" - lag($"ts_us", 1).over(w)).as("gap_us"),
            count(lit(1)).over(trailing).cast("int").as("n_in_frame"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |round(avg(value) OVER w4, 6) AS ma4,
             |round(max(value) OVER w4, 6) AS peak4,
             |round(min(value) OVER w4, 6) AS trough4,
             |epoch_us(ts) - lag(epoch_us(ts)) OVER wo AS gap_us,
             |CAST(count(*) OVER w4 AS INTEGER) AS n_in_frame
             |FROM events WHERE user_id < 100
             |WINDOW wo AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
             |w4 AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // Ordered-sequence funnel (view → click → purchase) with conversion
    // windows: per user, the first view, the first click within 24 h AT
    // OR AFTER that view, the first purchase within 24 h of that click —
    // the strictly-ordered, attribution-windowed funnel semantics (a
    // purchase before any view, or a week later, does not count). Three
    // chained conditional-min windows share ONE user-partitioned sort —
    // a single shuffle; the per-stage rollup is a 4-row aggregate. All
    // timestamps integer micros, so every value is exact.
    Q(
      "q32_funnel",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
        val hop = 24L * 3600 * 1000000 // 24 h conversion window, micros
        val staged = Tables.events(s, dir)
          .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_type")
          .withColumn("tv",
            min(when($"event_type" === "view", $"ts_us")).over(w))
          .withColumn("tc",
            min(when($"event_type" === "click" &&
              $"ts_us" >= $"tv" && $"ts_us" <= $"tv" + hop, $"ts_us")).over(w))
          .withColumn("tp",
            min(when($"event_type" === "purchase" &&
              $"ts_us" >= $"tc" && $"ts_us" <= $"tc" + hop, $"ts_us")).over(w))
          .select($"user_id", $"tv", $"tc", $"tp").distinct()
        staged
          .select($"user_id",
            when($"tp".isNotNull, "3_purchase")
              .when($"tc".isNotNull, "2_click")
              .when($"tv".isNotNull, "1_view")
              .otherwise("0_none").as("stage"),
            ($"tp" - $"tv").as("lag_us"))
          .groupBy($"stage")
          .agg(count(lit(1)).as("n_users"),
            coalesce(sum($"lag_us"), lit(0L)).as("total_lag_us"))
          .orderBy($"stage")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type
             |  FROM events),
             |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts_us END)
             |    OVER (PARTITION BY user_id) AS tv FROM e),
             |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts_us >= tv
             |    AND ts_us <= tv + 86400000000
             |    THEN ts_us END) OVER (PARTITION BY user_id) AS tc FROM w1),
             |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_us >= tc
             |    AND ts_us <= tc + 86400000000
             |    THEN ts_us END) OVER (PARTITION BY user_id) AS tp FROM w2),
             |u AS (SELECT DISTINCT user_id, tv, tc, tp FROM w3),
             |st AS (SELECT user_id,
             |  CASE WHEN tp IS NOT NULL THEN '3_purchase'
             |    WHEN tc IS NOT NULL THEN '2_click'
             |    WHEN tv IS NOT NULL THEN '1_view'
             |    ELSE '0_none' END AS stage,
             |  tp - tv AS lag_us FROM u)
             |SELECT stage, count(*) AS n_users,
             |CAST(coalesce(sum(lag_us), 0) AS BIGINT) AS total_lag_us
             |FROM st GROUP BY stage ORDER BY stage""".stripMargin)),

    // Per-user exponential moving average of event values, α = 1/2
    // (zero-seeded), in CLOSED form: s_n = Σ_i x_i · 2^(i−n−1). Each
    // contribution is the value times an exact power-of-two scale
    // (IEEE-exact on both engines), and the sum runs in exact decimal —
    // associative, so partitioning cannot reorder anything observable.
    // No per-user array: position/count come from one sort-based window
    // over the user partition and the sum is a plain hash agg, so a
    // power user's history streams through bounded state instead of
    // landing in a single collect_list row (the 100×-safe form; the r4
    // fold-over-collect_list shape is gone).
    Q(
      "q50_ema",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val wu = Window.partitionBy($"user_id")
        Tables.events(s, dir)
          .withColumn("i", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wu))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
            round(sum(($"value" * pow(lit(2.0), $"i" - $"n" - 1))
              .cast("decimal(38,18)")).cast("double"), 6).as("ema"))
          .orderBy($"user_id")
      },
      Some("""WITH w AS (SELECT user_id, value,
             |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
             |  count(*) OVER (PARTITION BY user_id) AS n
             |  FROM events)
             |SELECT user_id, count(*) AS n_events,
             |  round(CAST(sum(CAST(value * pow(2.0, i - n - 1)
             |    AS DECIMAL(38,18))) AS DOUBLE), 6) AS ema
             |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Spark's NATIVE session_window aggregation (the engine-managed
    // merging-interval form of q24's manual gaps-and-islands): each
    // event opens [t, t+gap) and overlapping intervals merge, so a
    // session breaks exactly when the inter-event gap is >= the window
    // gap, and the session end is last_event + gap. The oracle replays
    // the merge rule relationally. Same decimal-exact value sums as the
    // sm06 family. One shuffle on (session_window, user) — the state is
    // per-open-session, never per-event (the 100 TB shape), and the
    // IDENTICAL plan serves the streaming path (sm11).
    Q(
      "q51_session_window",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
          .agg(count(lit(1)).as("n_events"),
            sum($"value".cast("decimal(18,6)")).as("sv"))
          .select($"user_id",
            unix_micros($"w.start").as("start_us"),
            unix_micros($"w.end").as("end_us"),
            $"n_events",
            round($"sv", 2).cast("double").as("sum_value"))
          .orderBy($"user_id", $"start_us")
      },
      Some(sessionWindowOracle)),

    // Pre-shuffle skew audit — the diagnosis a 100 TB job runs BEFORE
    // keying a join/agg on a column: per-key histogram (one partial-agg
    // groupBy), global top-5 heavy hitters via TakeOrderedAndProject
    // (map-side partial top-k, no global sort), and the skew factor
    // max/avg that decides between a plain shuffle, AQE skew handling,
    // or an explicit salt (q19's operator). All integer arithmetic +
    // one rounded ratio — trivially exact cross-engine.
    Q(
      "q52_skew_audit",
      (s, dir) => {
        import s.implicits._
        val counts = Tables.events(s, dir)
          .groupBy($"user_id").agg(count(lit(1)).as("cnt"))
        val summary = counts.agg(sum($"cnt").as("total"),
          count(lit(1)).as("nkeys"), max($"cnt").as("maxc"))
        val top = counts.orderBy($"cnt".desc, $"user_id").limit(5)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy($"cnt".desc, $"user_id")
        top.crossJoin(broadcast(summary))
          .withColumn("rnk", row_number().over(w))
          .select($"rnk", $"user_id", $"cnt",
            round($"cnt".cast("double") / $"total", 6).as("share"),
            round($"maxc".cast("double") * $"nkeys" / $"total", 6)
              .as("skew_factor"),
            ($"maxc".cast("double") * $"nkeys" / $"total" >= 4.0)
              .as("salt_recommended"))
          .orderBy($"rnk")
      },
      Some("""WITH c AS (SELECT user_id, count(*) AS cnt
             |  FROM events GROUP BY user_id),
             |s AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
             |  count(*) AS nkeys, max(cnt) AS maxc FROM c),
             |t AS (SELECT user_id, cnt, row_number() OVER
             |    (ORDER BY cnt DESC, user_id) AS rnk FROM c)
             |SELECT CAST(rnk AS INTEGER) AS rnk, user_id, cnt,
             |  round(cnt::DOUBLE / total, 6) AS share,
             |  round(maxc::DOUBLE * nkeys / total, 6) AS skew_factor,
             |  maxc::DOUBLE * nkeys / total >= 4.0 AS salt_recommended
             |FROM t CROSS JOIN s WHERE rnk <= 5
             |ORDER BY rnk""".stripMargin))
  )

  /** Shared q51/sm11 oracle: session_window's merge rule as
    * gaps-and-islands — break on gap >= 30 min, end = last + 30 min.
    */
  private[queries] def sessionWindowOracle: String =
    """WITH m AS (SELECT user_id, event_id, epoch_us(ts) AS t, value,
      |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
      |  THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |i AS (SELECT user_id, t, value,
      |  sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m)
      |SELECT user_id, min(t) AS start_us, max(t) + 1800000000 AS end_us,
      |  count(*) AS n_events,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
      |FROM i GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin
}
