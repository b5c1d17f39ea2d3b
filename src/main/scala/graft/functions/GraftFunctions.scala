package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.ColumnBridge

/** SQL-surface registration for the engine's custom Catalyst expressions.
  * `register(spark)` makes them callable from `spark.sql` text in the
  * current session; `GraftExtensions` does the same through the standard
  * `spark.sql.extensions` mechanism at session build time.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "intersect_size",
      exprs => IntersectSize(exprs(0), exprs(1)))
    ColumnBridge.registerFunction(spark, "fnv1a64",
      exprs => Fnv1a64(exprs(0)))
    ColumnBridge.registerFunction(spark, "fnv1a_perm",
      exprs => Fnv.permBuilder(exprs))
    ColumnBridge.registerFunction(spark, "nlz_plus1",
      exprs => NlzPlus1(exprs(0)))
    ColumnBridge.registerFunction(spark, "ntz_plus1",
      exprs => NtzPlus1(exprs(0)))
    ColumnBridge.registerFunction(spark, "lang_id",
      exprs => LangIdExpr(exprs(0)))
    ColumnBridge.registerFunction(spark, "nltk_stop_count",
      exprs => NltkStopCount(exprs(0)))
    ColumnBridge.registerFunction(spark, "nfc_normalize",
      exprs => NfcNormalize(exprs(0)))
    ColumnBridge.registerFunction(spark, "strip_accents",
      exprs => StripAccents(exprs(0)))
    ColumnBridge.registerFunction(spark, "dot_product",
      exprs => DotProduct(exprs(0), exprs(1)))
    ColumnBridge.registerFunction(spark, "sq_dist",
      exprs => SqDist(exprs(0), exprs(1)))
    ColumnBridge.registerFunction(spark, "minhash_sig",
      exprs => MinHashSig(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()))
    ColumnBridge.registerFunction(spark, "simhash64",
      exprs => SimHash64(exprs(0)))
    ColumnBridge.registerFunction(spark, "word_shingles",
      exprs => WordShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()))
    ColumnBridge.registerFunction(spark, "char_ngrams",
      exprs => CharNgrams(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()))
  }
}

/** Use via `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.FuseTextExpressions)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("intersect_size"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[IntersectSize].getName, "intersect_size"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        IntersectSize(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("fnv1a64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Fnv1a64].getName, "fnv1a64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Fnv1a64(exprs(0))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("fnv1a_perm"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Fnv1aPerm].getName, "fnv1a_perm"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Fnv.permBuilder(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("nlz_plus1"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NlzPlus1].getName, "nlz_plus1"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NlzPlus1(exprs(0))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("ntz_plus1"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NtzPlus1].getName, "ntz_plus1"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NtzPlus1(exprs(0))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("lang_id"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LangIdExpr].getName, "lang_id"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LangIdExpr(exprs(0))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("nltk_stop_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NltkStopCount].getName, "nltk_stop_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NltkStopCount(exprs(0))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NfcNormalize(exprs(0))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("strip_accents"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[StripAccents].getName, "strip_accents"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        StripAccents(exprs(0))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("sq_dist"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SqDist].getName, "sq_dist"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SqDist(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSig(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs(0))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordShingles(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("char_ngrams"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CharNgrams].getName, "char_ngrams"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CharNgrams(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue())))
  }
}
