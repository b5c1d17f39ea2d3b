package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Amazon-review TSV ingestion (SURVEY.md §1.1, §2.1 S1-S4; FIXTURES.md §A):
  * one tab-separated file per product with a header row and 6 columns.
  *
  * Differences from the reference, by design:
  *  - ONE schema'd CSV scan with `header=true` replaces `sc.textFile` +
  *    per-line `split('\t')`; the header row is never parsed as data
  *    (quirk Q1: the reference's LSA path forgets to strip it — we do not
  *    reproduce that bug);
  *  - malformed rows go to PERMISSIVE null-padding instead of crashing
  *    the destructure (SURVEY §1.2);
  *  - the per-product file loop (S2) becomes one glob scan +
  *    `input_file_name()`, so a 30-file corpus and a 100 TB corpus use
  *    the same plan.
  */
object ReviewSource {

  val schema: StructType = StructType(Seq(
    StructField("review_id", StringType),
    StructField("product_title", StringType),
    StructField("star_rating", IntegerType),
    StructField("vine", StringType),
    StructField("verified_purchase", StringType),
    StructField("review_body", StringType)))

  /** Read one product file or a glob of them. Adds `product_id` derived
    * from the file name (reference: file-per-product naming, :32-34).
    */
  def reviews(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)
      .withColumn("product_id",
        regexp_extract(input_file_name(), "([^/]+)\\.txt$", 1))

  /** Sentence table (P2): split on '.', positional ids
    * `review_id + "_" + idx`, exactly like BigdataProjectCode.py:44-45.
    */
  def sentences(reviews: DataFrame): DataFrame =
    reviews
      .select(col("product_id"), col("review_id"),
        posexplode(split(col("review_body"), "\\.")).as(Seq("sent_idx", "sentence")))
      .select(col("product_id"), col("review_id"),
        concat_ws("_", col("review_id"), col("sent_idx")).as("sentence_id"),
        col("sent_idx"), col("sentence"))
}
