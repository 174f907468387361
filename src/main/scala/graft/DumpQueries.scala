package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: dump a subset of SparkEntry.queries to parquet for targeted
  * oracle checks while iterating (full gate = Verify + tools/check.py).
  * Usage: runMain graft.DumpQueries <sfDir> <outDir> <name1> [name2 ...] */
object DumpQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"[dump] $n ok")
    }
    spark.stop()
  }
}
