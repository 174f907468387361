package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: write each named query's `.explain("formatted")` output to
  * `<outDir>/<name>_<tag>.txt` — the plan evidence the optimization rounds
  * commit under plans/r{N}/ (the judge checks plan claims against these
  * files without running Spark).
  *
  * Usage: runMain graft.DumpPlans <outDir> <tag> <name1> [name2 ...]
  * with SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench. Queries are
  * EXECUTED first (noop-style count) so AQE final plans are real; the
  * dump records the executed plan string plus the formatted explain.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlans <outDir> <tag> <name...>")
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      spark.sparkContext.setJobDescription(s"dumpplans: $n")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.count() // materialize so AQE final plans are real
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val executed = df.queryExecution.executedPlan.toString
      val txt = s"== $n ($sfDir) ==\n\n$formatted\n\n" +
        s"== executed plan (AQE final) ==\n\n$executed\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plans] $n -> $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
