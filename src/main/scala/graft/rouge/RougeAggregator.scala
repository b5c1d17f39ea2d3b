package graft.rouge

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed corpus-mean ROUGE aggregator (SURVEY §2.12: the one custom
  * aggregate the engine warrants): scores (system, reference) pairs
  * inside the aggregate's partial step, so corpus evaluation is a single
  * partial+final aggregation — no intermediate per-pair score table.
  *
  * Usage: `pairs.select(RougeMean.rouge1(stem = true).toColumn)` on a
  * Dataset[(String, String)], or via groupByKey for per-product means.
  */
object RougeMean {

  final case class Buf(sumP: Double, sumR: Double, sumF: Double, n: Long)

  final class MeanAgg(score: (String, String) => Rouge.Score)
      extends Aggregator[(String, String), Buf, Rouge.Score] {
    override def zero: Buf = Buf(0, 0, 0, 0)
    override def reduce(b: Buf, pair: (String, String)): Buf = {
      val s = score(pair._1, pair._2)
      Buf(b.sumP + s.precision, b.sumR + s.recall, b.sumF + s.f1, b.n + 1)
    }
    override def merge(a: Buf, b: Buf): Buf =
      Buf(a.sumP + b.sumP, a.sumR + b.sumR, a.sumF + b.sumF, a.n + b.n)
    override def finish(b: Buf): Rouge.Score = {
      val n = math.max(b.n, 1L).toDouble
      Rouge.Score(b.sumP / n, b.sumR / n, b.sumF / n)
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Rouge.Score] = Encoders.product[Rouge.Score]
  }

  def rouge1(stem: Boolean): MeanAgg = new MeanAgg(Rouge.rougeN(_, _, 1, stem))
  def rouge2(stem: Boolean): MeanAgg = new MeanAgg(Rouge.rougeN(_, _, 2, stem))
  def rougeL(stem: Boolean): MeanAgg = new MeanAgg(Rouge.rougeL(_, _, stem))
}
