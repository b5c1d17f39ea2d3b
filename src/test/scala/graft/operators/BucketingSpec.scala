package graft.operators

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("bucketed co-located join: no Exchange in the plan, same result") {
    val s = spark
    import s.implicits._
    val dir = sf("sf0.001")
    val orders = s.read.parquet(s"$dir/orders.parquet")
      .select($"o_orderkey", $"o_orderdate")
    val lineitem = s.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    val prevBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Bucketing.writeBucketed(orders, "b_orders", 4, Seq("o_orderkey"))
      Bucketing.writeBucketed(lineitem, "b_lineitem", 4, Seq("l_orderkey"))
      // force the shuffle-based strategy so the assertion is about the
      // bucketed layout, not about broadcast kicking in
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = s.table("b_orders")
        .join(s.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, got:\n$plan")
      // the pre-write repartition gives exactly one data file per bucket
      // (no tasks×buckets fragmentation)
      val files = new java.io.File(s.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), "b_orders")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 4, s"expected 4 bucket files, got $files")
      val expected = orders
        .join(lineitem, $"o_orderkey" === $"l_orderkey").count()
      assert(j.count() == expected)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("q20 gate query equals the plain join aggregation and cleans up") {
    val s = spark
    import s.implicits._
    val dir = sf("sf0.001")
    val q20 = graft.queries.Relational.all.find(_.name == "q20_bucketed_join").get
    val got = q20.run(s, dir).as[(String, Long, Double)].collect().toSeq
    val want = s.read.parquet(s"$dir/lineitem.parquet")
      .join(s.read.parquet(s"$dir/orders.parquet"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum($"l_quantity"), 2).as("qty"))
      .orderBy($"o_orderpriority")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == want)
    // scratch tables dropped
    assert(!s.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_li_")))
  }
}
