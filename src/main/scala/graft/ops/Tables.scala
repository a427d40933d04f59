package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver's testdata layout
  * (`<dir>/<name>.parquet`). Centralized so a different catalog (e.g. a
  * real Iceberg catalog, absent in this sandbox — see SURVEY.md §2.8) can
  * be slotted in behind one function.
  */
object Tables {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
