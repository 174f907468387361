package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: execute any registered queries by name and print each
  * executed physical plan — the `.explain`-and-iterate loop the build
  * discipline mandates after every operator lands.
  *
  * Usage: `sbt "runMain graft.ProfilePlan <query> [<query> ...]"`,
  * with `SPARK_GRAFT_SF_DIR` selecting the table directory.
  */
object ProfilePlan {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfilePlan <queryName> [<queryName> ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      println(s"===== $name ($sfDir) =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // materialize so AQE final plans and metrics are real
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
