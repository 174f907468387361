package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: native SimHash60 vs the interpreted HOF form. */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.register(spark)
    val toks = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " ")).cache()
    toks.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    (1 to 2).foreach { _ =>
      time("native graft_simhash")(toks.select(
        call_function("graft_simhash", col("toks"))).count())
      time("HOF simhashExpr")(toks.select(
        graft.operators.Dedup.simhashExpr("toks")).count())
    }
    spark.stop()
  }
}
