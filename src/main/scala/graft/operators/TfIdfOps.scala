package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** A2+A3: per-doc term frequency joined with per-term document
  * frequency (app.py:156-157) — the relational spine of TF-IDF.
  * One explode + two hash aggregates + one broadcast-size join on
  * `term`; no UDFs, no driver-side work. */
object TfIdfOps {
  def termDocFreq(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextOps.cleanTokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = toks.groupBy("term")
      .agg(countDistinct("doc_id").as("df"))
    tf.join(df, "term").select("doc_id", "term", "tf", "df")
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
