package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the minhash pair pipeline at sf0.1 —
  * round-9 measurement scaffolding (guide §1).
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.ops.Tables.tbl(spark, "/root/testdata/sf0.1", "documents")
    import graft.ops.TextOps
    def time(label: String)(body: => Long): Unit = {
      body // warm
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = body
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
      spark.catalog.clearCache()
    }
    time("shingles")(TextOps.shingles(docs, 3).count())
    time("cappedShingles")(TextOps.cappedShingles(docs, 3, 1000).count())
    time("signatures")(TextOps.minhashSignatures(docs).count())
    time("lshCandidates")(TextOps.minhashLshCandidates(docs, 3, 8, 2).count())
    time("minhashLshPairs")(TextOps.minhashLshPairs(docs, 3, 8, 2, 0.5).count())
    time("ngramJaccardPairs")(TextOps.ngramJaccardPairs(docs, 3, 0.8).count())
    spark.stop()
  }
}
