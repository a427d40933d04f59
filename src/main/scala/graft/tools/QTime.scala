package graft.tools
import org.apache.spark.sql.SparkSession

/** Controlled single-query re-timing: runs the named SparkEntry
  * queries alone at sf0.1/local[32], two cold reps each — the manual
  * adjudication companion to Bench's quiet-band machinery. When the
  * suite flags a query `suspect`, `runMain graft.tools.QTime <name>…`
  * on an otherwise idle host gives the clean reading.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (name <- args) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      val w1 = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      val w2 = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      println(f"QTIME $name rep1=$w1%.2f rep2=$w2%.2f")
    }
    spark.stop()
  }
}
