package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** A2+A3: per-doc term frequency joined with per-term document
  * frequency (app.py:156-157) — the relational spine of TF-IDF.
  * One scan + one explode + one hash aggregate + one window count on
  * `term`; no UDFs, no driver-side work. */
object TfIdfOps {
  def termDocFreq(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextOps.cleanTokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    // df derived from tf as a window count, not from a second aggregation
    // of the raw token stream: tf's output rows are already distinct
    // (doc_id, term) pairs, so rows-per-term equals countDistinct(doc_id).
    // A join formulation (tf ⋈ tf.groupBy(term).count) does NOT deduplicate
    // the work — column pruning rewrites the df branch into a distinct
    // aggregate keyed (term, doc_id), whose exchange no longer matches tf's
    // (doc_id, term) exchange, so neither plan-time ReuseExchange nor AQE
    // stage reuse fires and the scan + regex normalize chain + explode all
    // run twice (that was the shipped r19 shape: 2 parquet scans, 2
    // Generates, plus a countDistinct Expand). The window count keeps ONE
    // scan/Generate and trades the second pipeline for one exchange of the
    // already-aggregated (doc_id, term, tf) rows — at corpus scale the raw
    // text pass dominates that small shuffle by orders of magnitude.
    tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy("term")))
      .select("doc_id", "term", "tf", "df")
  }

  val termDocFreqSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, word AS term FROM (${TextOps.cleanToksSql})
       |  WHERE length(word) > 2
       |    AND word NOT IN (${TextOps.stopwordsSqlList})),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf
       |       FROM toks GROUP BY doc_id, term),
       |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df
       |       FROM toks GROUP BY term)
       |SELECT tf.doc_id, tf.term, tf.tf, df.df
       |FROM tf JOIN df USING (term)
       |ORDER BY doc_id, term""".stripMargin
}
