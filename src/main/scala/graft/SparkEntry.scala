package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core analytic: top-20 word frequency over the cleaned
    * corpus (app.py:168-169 + 46-57).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("word_freq_top20")(spark, "/root/testdata/sf0.001")

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A7/T2/T3 + P1-P5,P7,F3,F4: global word frequency, chart top-20.
    "word_freq_top20" -> ((s, dir) => TextOps.wordFreq(docs(s, dir), 20)),
    // A7/T2: the reference's full top-200 result table (app.py:169).
    "word_freq_top200" -> ((s, dir) => TextOps.wordFreq(docs(s, dir), 200))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "word_freq_top20" -> TextOps.wordFreqSql(20),
    "word_freq_top200" -> TextOps.wordFreqSql(200)
  )
}
