package graft

import org.apache.spark.sql.SparkSession

/** Cold-start reproduction: fresh JVM, first action is dedup_exact.count(),
  * exactly like Bench's first timed query. */
object ProfileCold {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("dedup_exact")(spark, sfDir).count()
    println(f"[cold] dedup_exact count=$n time=${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
