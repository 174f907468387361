package graft

import graft.operators.Joins
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev profiler for the iterative-join hot path (j2_chain_rollup):
  * phase timings for edge derivation, root resolution, and the rollup. */
object ProfileChain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.orders(spark, sfDir).count() // warm

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 2).foreach { iter =>
      println(s"--- iteration $iter ---")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val edges = Tables.orders(spark, sfDir).select(
        col("o_orderkey").as("child"),
        lag(col("o_orderkey"), 1).over(w).as("parent"))
      val edgesM = time("edges materialize")(edges.localCheckpoint())
      Seq(1, 2, 4, 7).foreach { s =>
        time(s"resolveRoots jumps=$s") {
          Joins.resolveRoots(edgesM, edgesCoverAllNodes = true,
            jumpsPerRound = s).count()
        }
      }
      val roots = Joins.resolveRoots(edgesM, edgesCoverAllNodes = true)
      val n = time("rollup") {
        Tables.orders(spark, sfDir)
          .join(roots, col("o_orderkey") === col("node"))
          .groupBy(col("root"))
          .agg(count(lit(1)).as("n_chain")).count()
      }
      println(s"[profile] groups: $n")
    }
    spark.stop()
  }
}
