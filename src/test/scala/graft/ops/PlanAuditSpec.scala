package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Physical-plan audit over every driver query at sf0.001: the plan
  * shapes that would break at 100 TB are failures here, not review
  * notes. Rules:
  *  - no CartesianProduct anywhere;
  *  - BroadcastNestedLoopJoin only in the one documented bounded
  *    pattern: dggs_knn (escalation fallback — broadcast of the
  *    provably-rare incomplete queries); emb_cosine_topk left the list
  *    in round 4 (now a broadcast-queries mapPartitions scan);
  *  - the flagship point-in-polygon join broadcasts its cover side.
  */
class PlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("graft-plan-audit")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"
  private val bnljAllowed = Set("dggs_knn")

  test("no cartesian product in any driver query; BNLJ only where bounded") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- graft.SparkEntry.queries) {
      // checkpoint rollup executes eagerly (writes parts) — plan-audit
      // its input query shape via the others; skip the side-effecting one
      if (name != "dggs_checkpoint_rollup") {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          offenders += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
          offenders += s"$name: BroadcastNestedLoopJoin"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("flagship spatial join broadcasts the polygon-cover side") {
    import org.apache.spark.sql.functions._
    val geo = CorpusOps.geoSpans(CorpusOps.interleavedDocs(Tables.tbl(spark, sfDir, "documents")))
    val polys = Seq(("e", "POLYGON ((20.2 57.0, 28.4 57.0, 28.4 60.0, 20.2 60.0, 20.2 57.0))"))
    val plan = SpatialOps.pointInPolygonJoin(geo, "lon", "lat", polys, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("shingle DF cap plans as a broadcast anti-join, not a keep-set join") {
    // round-2 regression guard: joining the nearly-complete keep set was
    // a full sort-merge join on long string keys (46 s of an 88.7 s
    // bench); the cap must stay a broadcast LEFT ANTI against the tiny
    // hot set
    import spark.implicits._
    val docs = (0 until 200)
      .map(i => (i.toLong, s"a$i b$i c$i d$i e$i")).toDF("doc_id", "text")
    val plan = TextOps.cappedShingles(docs, 3, 1000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("parquet scan prunes columns: cell assign reads only what it needs") {
    val plan = graft.SparkEntry.queries("dggs_cell_assign")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the corpus is synthesized from doc_id only — the documents scan
    // must not read the text column
    val scan = plan.linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
    assert(scan.contains("doc_id") && !scan.contains("text"), scan)
  }
}
