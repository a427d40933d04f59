package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** KMV distinct-count sketch (native TypedImperativeAggregate):
  * exact-below-k, bit-deterministic under any partitioning (merge is
  * exact, not approximate), formula-equal to an independent driver-side
  * recompute, and partial-aggregated in the physical plan.
  */
class KmvSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("graft-kmv-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def est(df: org.apache.spark.sql.DataFrame, k: Int): Double =
    df.agg(SketchFunctions.kmvDistinct(col("v"), k).as("e"))
      .head().getDouble(0)

  test("exact below k; duplicates never inflate") {
    import spark.implicits._
    val vals = (0 until 100).flatMap(i => Seq.fill(5)(s"v$i"))
    assert(est(vals.toDF("v"), 256) == 100.0)
    assert(est(Seq.empty[String].toDF("v"), 64) == 0.0)
  }

  test("bit-identical under any partitioning; matches the formula recompute") {
    import spark.implicits._
    val n = 5000
    val data = (0 until n).map(i => s"doc-$i")
    val k = 64
    val ests = Seq(1, 4, 32).map(p =>
      est(data.toDF("v").repartition(p), k))
    assert(ests.distinct.size == 1,
      s"estimate varies with partitioning: $ests")
    // independent recompute: k smallest 48-bit md5 prefixes, same formula
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = data.map { v =>
      md.reset()
      val b = md.digest(v.getBytes("UTF-8"))
      ((b(0) & 0xFFL) << 40) | ((b(1) & 0xFFL) << 32) | ((b(2) & 0xFFL) << 24) |
        ((b(3) & 0xFFL) << 16) | ((b(4) & 0xFFL) << 8) | (b(5) & 0xFFL)
    }.distinct.sorted
    val expected = ((k - 1).toDouble / hashes(k - 1).toDouble) * 281474976710656.0
    assert(ests.head == expected, s"${ests.head} != formula $expected")
    // and the estimate is actually an estimate OF n
    assert(math.abs(ests.head - n) / n < 0.25,
      s"relative error ${math.abs(ests.head - n) / n} too large at k=$k")
  }

  test("plan: ObjectHashAggregate with a partial kmv phase (map-side combine)") {
    import spark.implicits._
    val df = (0 until 200).map(i => (s"g${i % 4}", s"v$i")).toDF("g", "v")
      .groupBy("g").agg(SketchFunctions.kmvDistinct(col("v"), 16).as("e"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert("partial_kmv_distinct|partial kmv_distinct".r.findFirstIn(plan).isDefined
      || plan.contains("kmv_distinct"), plan.take(2000))
    // two aggregate phases = partial + final (the shuffle carries sketch
    // state, not distinct keys)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
  }
}
