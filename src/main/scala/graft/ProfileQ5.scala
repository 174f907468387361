package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: print the physical plan of a headline query. */
object ProfileQ5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = sys.env.getOrElse("SPARK_GRAFT_QUERY", "q5_star_join")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count() // let AQE finalize
    println("=== formatted ===")
    df.explain("formatted")
    spark.stop()
  }
}
