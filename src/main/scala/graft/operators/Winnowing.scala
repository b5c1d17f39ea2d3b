package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
  * "Winnowing: local algorithms for document fingerprinting" — the MOSS
  * algorithm): normalize text (lowercase, strip non-alphanumerics),
  * hash every character k-gram, slide a w-hash window and keep each
  * window's minimum hash (rightmost position on ties), dedupe the
  * selected positions. The selection guarantee is what distinguishes
  * this from uniform sampling: any substring match of length
  * >= w + k - 1 between two documents yields at least one SHARED
  * fingerprint, while only ~2/(w+1) of all grams are retained.
  *
  * Where [[Dedup.minhashSignature]] summarizes a whole document into a
  * fixed signature (document-level near-dup) and the d27 CDC chunker
  * cuts at content boundaries (chunk-level storage dedup), winnowing is
  * the PARTIAL-OVERLAP detector: it localizes which regions two
  * documents share, robust to insertion/reordering — the
  * plagiarism/attribution shape.
  *
  * Scale shape: one narrow pass hashes every gram (posexplode +
  * codegen'd FNV), one doc-keyed shuffle feeds a sliding ROWS-window
  * min — the rightmost-tie rule rides a lexicographic struct-min over
  * (h, -pos), so selection is a single window pass with O(w) state and
  * no per-document array materialization. (A first cut computed the
  * hash array and window scan as nested HOFs over one projection;
  * Catalyst inlined the array expression into every element_at of the
  * scan lambda and re-evaluated the whole FNV chain per comparison —
  * O(n²·w) per doc. Lambdas must reference ATTRIBUTES, not inlined
  * expression trees.) The pair join downstream rides a
  * document-frequency cap exactly like the LSH band-bucket cap.
  */
object Winnowing {

  /** Per-document fingerprints: (id, pos, h) with pos the 0-based gram
    * position of each selected hash. Documents shorter than w + k - 1
    * normalized chars yield no fingerprints (no full window exists).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 8): DataFrame = {
    require(k >= 2 && w >= 2, s"k=$k / w=$w out of range")
    val nrm = lower(regexp_replace(col(textCol), "[^A-Za-z0-9]", ""))
    val grams = docs.select(col(idCol).as("id"), nrm.as("nrm"))
      .where(length(col("nrm")) >= k + w - 1)
      .select(col("id"), posexplode(expr(
        s"transform(sequence(0, length(nrm) - $k), i -> substring(nrm, i + 1, $k))")))
      .toDF("id", "pos", "gr")
      .select(col("id"), col("pos"),
        graft.functions.Fnv.fnv1a64(col("gr")).as("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    grams
      .withColumn("nw", count(lit(1)).over(win))
      .withColumn("mn", min(struct(col("h").as("h"),
        (-col("pos")).as("np"))).over(win))
      .where(col("nw") === w)
      .select(col("id"), (-col("mn.np")).as("pos"), col("mn.h").as("h"))
      .distinct()
  }

  /** Pairs of documents sharing >= minShared fingerprint hashes, with
    * the containment-style overlap n_shared / min(|fp_a|, |fp_b|).
    * Fingerprint hashes held by more than dfCap documents are dropped
    * from pair GENERATION (boilerplate grams carry no attribution
    * signal and would quadratically blow the self-join — the same cap
    * discipline as the LSH band-bucket limit); the overlap denominator
    * keeps the uncapped per-doc fingerprint counts.
    */
  def overlapPairs(fp: DataFrame, minShared: Int = 2,
      dfCap: Int = 50): DataFrame = {
    val dfp = fp.select(col("id"), col("h")).distinct()
    val hcnt = dfp.groupBy(col("h")).agg(count(lit(1)).as("nd"))
    val capped = dfp.join(hcnt.filter(col("nd") <= dfCap), Seq("h"))
    val nfp = dfp.groupBy(col("id")).agg(count(lit(1)).as("nf"))
    val pr = capped.as("x").join(capped.as("y"),
        col("x.h") === col("y.h") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pr.join(nfp.withColumnRenamed("id", "a").withColumnRenamed("nf", "nfa"), "a")
      .join(nfp.withColumnRenamed("id", "b").withColumnRenamed("nf", "nfb"), "b")
      .select(col("a"), col("b"), col("n_shared"),
        round(col("n_shared") * lit(1.0) / least(col("nfa"), col("nfb")), 6)
          .as("overlap"))
  }
}
