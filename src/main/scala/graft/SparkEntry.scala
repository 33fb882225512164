package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.CorpusOps

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

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Operators in `graft.operators`/`graft.functions` return UNSORTED
    * DataFrames (no library operator embeds a global sort — a full
    * range-partition of the corpus would be a 100 TB scale-killer).
    * The deterministic ORDER BY that the driver's row-by-row hash compare
    * needs is applied HERE, at the verification edge only.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A7/T2/T3 + P1-P5,P7,F3,F4: global word frequency, chart top-20.
    "word_freq_top20" -> ((s, dir) => TextOps.wordFreq(docs(s, dir), 20)),
    // A7/T2: the reference's full top-200 result table (app.py:169).
    "word_freq_top200" -> ((s, dir) => TextOps.wordFreq(docs(s, dir), 200)),
    // P1-P5,P7,F3,F4: the clean_text projection (app.py:46-57).
    "clean_text" -> ((s, dir) => CorpusOps.cleanTexts(docs(s, dir)).orderBy("doc_id")),
    // P8+F2: derived word count, empty docs dropped (app.py:115,117).
    "word_count" -> ((s, dir) => CorpusOps.wordCounts(docs(s, dir)).orderBy("doc_id")),
    // F1+T4: keyword OR predicate + lang filter (app.py:83-89).
    "keyword_filter" -> ((s, dir) => CorpusOps.keywordFilter(docs(s, dir)).orderBy("doc_id")),
    // Text-quality scoring (north-star corpus filtering).
    "doc_stats" -> ((s, dir) => CorpusOps.docStats(docs(s, dir)).orderBy("doc_id")),
    // Corpus stats per language (exact bigint sums).
    "lang_dist" -> ((s, dir) => CorpusOps.langDist(docs(s, dir)).orderBy("lang")),
    // Document fingerprinting (md5 of cleaned text).
    "doc_fingerprint" -> ((s, dir) => CorpusOps.fingerprints(docs(s, dir)).orderBy("doc_id")),
    // Exact dedup: deterministic survivor + dup count per fingerprint.
    "dedup_exact" -> ((s, dir) => CorpusOps.dedupExact(docs(s, dir)).orderBy("keep_id")),
    // A2+A3: per-doc term frequency ⋈ per-term document frequency — the
    // relational spine of TF-IDF (app.py:156-157).
    "term_doc_freq" -> ((s, dir) => graft.operators.TfIdfOps.termDocFreq(docs(s, dir)).orderBy("doc_id", "term"))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "word_freq_top20" -> TextOps.wordFreqSql(20),
    "word_freq_top200" -> TextOps.wordFreqSql(200),
    "clean_text" -> CorpusOps.cleanTextsSql,
    "word_count" -> CorpusOps.wordCountsSql,
    "keyword_filter" -> CorpusOps.keywordFilterSql,
    "doc_stats" -> CorpusOps.docStatsSql,
    "lang_dist" -> CorpusOps.langDistSql,
    "doc_fingerprint" -> CorpusOps.fingerprintsSql,
    "dedup_exact" -> CorpusOps.dedupExactSql,
    "term_doc_freq" -> graft.operators.TfIdfOps.termDocFreqSql
  )
}
