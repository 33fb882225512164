package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dumps .explain("formatted") for every declared query to
  * plans/<dir>/<query>_<suffix>.txt (suffix = args(0), e.g. before/after;
  * dir = args(1), default r22).
  *
  * With SPARK_GRAFT_PLANDUMP_EXEC=1 additionally executes each query
  * (collect) and writes the FINAL AQE plan to
  * <query>_<suffix>_executed.txt — the initial formatted plan of an
  * AdaptiveSparkPlan cannot show runtime stage reuse (ReusedExchange) or
  * AQE join rewrites, so one-scan/reuse claims need the executed dump.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val dir = if (args.length > 1) args(1) else "r22"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val exec = sys.env.get("SPARK_GRAFT_PLANDUMP_EXEC").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = Paths.get(s"plans/$dir")
    Files.createDirectories(outDir)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      if (exec) {
        df.collect()
        Files.writeString(outDir.resolve(s"${name}_${suffix}_executed.txt"),
          df.queryExecution.executedPlan.toString)
      }
      println(s"[plandump] wrote $name" + "_" + suffix)
    }
    spark.stop()
  }
}
