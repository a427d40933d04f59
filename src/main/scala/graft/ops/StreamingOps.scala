package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.spark.{DggsFunctions => F}

/** Structured Streaming surface: the cell math is a narrow stateless
  * map, so every batch operator lifts to streams unchanged; stateful
  * aggregation uses watermarked windows (the reference has no streaming
  * — SURVEY.md §1.1 — this is engine-added capability for continuous
  * ingestion of the 10^12-doc corpus).
  */
object StreamingOps {

  /** assign cells on a stream (works identically on readStream frames) */
  def assignCells(stream: DataFrame, lonCol: String, latCol: String, res: Int): DataFrame =
    stream.withColumn("cell_id", F.cellForPoint(col(lonCol), col(latCol), lit(res)))

  /** per-cell, per-time-window counts with a watermark: the streaming
    * form of BIN_POINT_VALS/occupancy (append-mode compatible).
    */
  def cellCountsWindowed(stream: DataFrame, tsCol: String, lonCol: String,
                         latCol: String, res: Int,
                         windowDur: String, watermarkDur: String): DataFrame =
    assignCells(stream, lonCol, latCol, res)
      .withWatermark(tsCol, watermarkDur)
      .groupBy(window(col(tsCol), windowDur), col("cell_id"))
      .agg(count(lit(1)).as("n"), avg(col(latCol)).as("lat_mean"))

  /** streaming parent rollup at a coarser resolution (pure bit math on
    * the assigned cell — no second projection).
    */
  def rollup(assigned: DataFrame, tsCol: String, toRes: Int,
             windowDur: String, watermarkDur: String): DataFrame =
    assigned
      .withWatermark(tsCol, watermarkDur)
      .groupBy(window(col(tsCol), windowDur),
        F.z7AncestorAt(col("cell_id"), lit(toRes)).as("cell_coarse"))
      .agg(count(lit(1)).as("n"))
}
