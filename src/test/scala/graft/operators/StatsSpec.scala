package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stats.olsTrend closed-form fit on hand-computed integer points. */
class StatsSpec extends SparkSpec {

  test("olsTrend recovers an exact line") {
    import spark.implicits._
    // y = 2x + 1 exactly -> slope 2, intercept 1, zero residual
    val pts = Seq((10L, 21L), (20L, 41L), (30L, 61L)).map { case (x, y) =>
      ("a", x, y)
    }.toDF("g", "x", "y")
    val out = Stats.olsTrend(pts, "g", $"x", $"y")
      .select($"n", $"slope", $"intercept").as[(Long, Double, Double)].head()
    assert(out == ((3L, 2.0, 1.0)))
  }

  test("olsTrend matches the closed form on noisy points") {
    import spark.implicits._
    val xs = Seq(1L, 2L, 3L, 4L, 5L)
    val ys = Seq(3L, 2L, 7L, 5L, 11L)
    val df = xs.zip(ys).map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val n = xs.length
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val det = n * sxx - sx * sx
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = Stats.olsTrend(df, "g", $"x", $"y")
      .select($"slope", $"intercept").as[(Double, Double)].head()
    assert(out._1 == r6((n * sxy - sx * sy).toDouble / det))
    assert(out._2 == r6((sy * sxx - sx * sxy).toDouble / det))
  }

  test("olsTrend yields nulls for degenerate groups, not infinities") {
    import spark.implicits._
    // single point and a vertical stack: det = 0 for both
    val df = Seq(("one", 5L, 9L), ("stack", 3L, 1L), ("stack", 3L, 7L))
      .toDF("g", "x", "y")
    val out = Stats.olsTrend(df, "g", $"x", $"y")
      .select($"g", $"slope", $"intercept")
      .as[(String, Option[Double], Option[Double])].collect()
    assert(out.forall(r => r._2.isEmpty && r._3.isEmpty))
  }

  test("pearson is ±1 on exact linear data and 0 on an even cross") {
    import spark.implicits._
    val df = (Seq((1L, 3L), (2L, 5L), (3L, 7L)).map { case (x, y) =>
      ("up", x, y)
    } ++ Seq((1L, 9L), (2L, 6L), (3L, 3L)).map { case (x, y) =>
      ("down", x, y)
    } ++ // symmetric cross: cov is exactly 0
      Seq((0L, 0L), (0L, 4L), (4L, 0L), (4L, 4L)).map { case (x, y) =>
        ("flat", x, y)
      }).toDF("g", "x", "y")
    val out = Stats.pearson(df, "g", $"x", $"y")
      .select($"g", $"r").as[(String, Double)].collect().toMap
    assert(out("up") == 1.0 && out("down") == -1.0 && out("flat") == 0.0)
  }

  test("pearson matches the closed form and nulls zero-variance groups") {
    import spark.implicits._
    val xs = Seq(1L, 2L, 3L, 4L, 5L)
    val ys = Seq(3L, 2L, 7L, 5L, 11L)
    val df = (xs.zip(ys).map { case (x, y) => ("g", x, y) } ++
      Seq(("const", 2L, 5L), ("const", 7L, 5L))).toDF("g", "x", "y")
    val n = xs.length
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val syy = ys.map(y => y * y).sum
    val expect = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = Stats.pearson(df, "g", $"x", $"y")
      .select($"g", $"r").as[(String, Option[Double])].collect().toMap
    assert(out("g").contains(r6(expect)))
    assert(out("const").isEmpty) // zero y-variance -> null, not NaN
  }
}
