package graft.dggs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    println("=== q1_agg plan ===")
    graft.SparkEntry.queries("q1_agg")(spark, dir).explain("formatted")
    println("=== q2_join_agg plan ===")
    graft.SparkEntry.queries("q2_join_agg")(spark, dir).explain("formatted")
    println("=== dggs_parent_rollup plan ===")
    graft.SparkEntry.queries("dggs_parent_rollup")(spark, dir).explain("formatted")
    println("=== pushdown check: lineitem filter+project ===")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .where(col("l_shipdate") > "1995-01-01").select("l_orderkey", "l_quantity")
      .explain("formatted")
    spark.stop()
  }
}
