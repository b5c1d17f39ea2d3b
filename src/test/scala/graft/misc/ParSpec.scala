package graft.misc

import graft.{Par, SparkSpec}

class ParSpec extends SparkSpec {

  test("fanOut widens an under-partitioned input to defaultParallelism") {
    import spark.implicits._
    val narrow = (1 to 100).toDF("x").coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    val wide = Par.fanOut(narrow)
    assert(wide.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(wide.as[Int].collect().sorted.toSeq == (1 to 100))
  }

  test("fanOut is a floor, never a cap: wide inputs pass through untouched") {
    import spark.implicits._
    val cores = spark.sparkContext.defaultParallelism
    val wide = (1 to 100).toDF("x").repartition(cores * 3)
    assert(Par.fanOut(wide).rdd.getNumPartitions == cores * 3)
  }
}
