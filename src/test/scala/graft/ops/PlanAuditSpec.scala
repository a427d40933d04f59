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
      // checkpoint rollup and the streaming-ingest query execute eagerly
      // (write parts / run a streaming job) — their component shapes are
      // plan-audited via the other queries; skip the side-effecting ones
      if (name != "dggs_checkpoint_rollup" && name != "stream_dedup_ingest") {
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

  test("PIP join df-variant: broadcastCovers flag selects the physical strategy") {
    import spark.implicits._
    val geo = CorpusOps.geoSpans(CorpusOps.interleavedDocs(Tables.tbl(spark, sfDir, "documents")))
    val polys = Seq(
      ("e", "POLYGON ((20.2 57.0, 28.4 57.0, 28.4 60.0, 20.2 60.0, 20.2 57.0))"))
      .toDF("poly_id", "wkt")
    val shufPlan = SpatialOps.pointInPolygonJoinDf(geo, "lon", "lat", polys, 4,
      broadcastCovers = Some(false)).queryExecution.executedPlan.toString
    assert(shufPlan.contains("ShuffledHashJoin"), shufPlan.take(2000))
    assert(!shufPlan.contains("BroadcastHashJoin"), shufPlan.take(2000))
    val bcPlan = SpatialOps.pointInPolygonJoinDf(geo, "lon", "lat", polys, 4,
      broadcastCovers = Some(true)).queryExecution.executedPlan.toString
    assert(bcPlan.contains("BroadcastHashJoin"), bcPlan.take(2000))
  }

  test("sampleMix plans with ZERO exchanges; packSequences with exactly one") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, s"t$i u$i v$i", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    // the mixture op's whole 100 TB story is that it is a narrow
    // projection + filter — a join or exchange appearing here means the
    // rate map stopped being a literal and the claim is void
    val mixPlan = TextOps.sampleMix(docs, Map("src0" -> 0.5, "src1" -> 1.0))
      .queryExecution.executedPlan.toString
    assert(!mixPlan.contains("Exchange"), mixPlan.take(2000))
    assert(!mixPlan.contains("Join"), mixPlan.take(2000))
    // PII redaction shares the narrow-projection claim
    val piiPlan = TextOps.redactPii(docs)
      .queryExecution.executedPlan.toString
    assert(!piiPlan.contains("Exchange"), piiPlan.take(2000))
    // packing pays exactly its one declared shuffle: the per-bucket
    // window (hash partition on bucket), nothing else
    val packPlan = TextOps.packSequences(docs, 64, 8)
      .queryExecution.executedPlan.toString
    val nEx = "Exchange hashpartitioning".r.findAllIn(packPlan).size
    assert(nEx == 1, s"expected 1 exchange, got $nEx:\n${packPlan.take(2000)}")
    assert(!packPlan.contains("Join"), packPlan.take(2000))
  }

  test("hex whole-earth enumeration: one codegen'd range projection, no exchange/UDF") {
    // the rank-bijection path's 100 TB story: N(res) cells from ONE
    // evenly-partitioned Range + native bit arithmetic — a UDF, explode
    // chain, or exchange here voids the plan-shape claim
    for (df <- Seq(GridOps.gridCellIdsForExtent3H(spark, 6),
                   GridOps.gridCellIdsForExtent4H(spark, 6),
                   GridOps.gridCellIdsForExtent43H(spark, 6, 3))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(2000))
      assert(!plan.contains("BatchEvalPython") && !plan.contains("Generate"),
        plan.take(2000))
      assert(!plan.toLowerCase.contains("pythonudf") &&
        !plan.contains("ScalaUDF"), plan.take(2000))
      assert(plan.contains("Range"), plan.take(2000))
      // "*(1)" is the whole-stage-codegen stage marker in the compact
      // executedPlan rendering
      assert(plan.contains("*(1) Project") && plan.contains("*(1) Range"),
        plan.take(2000))
    }
  }

  test("hamming64Pairs: explicit band partitioning; refine precedes pair dedup") {
    import spark.implicits._
    val sigs = (0L until 64L).map(i => (i, f"$i%016x")).toDF("media_id", "h")
    val plan = TextOps.hamming64Pairs(sigs, "media_id", "h", 3, 10000)
      .queryExecution.executedPlan.toString
    // the banding exchange must be USER-SPECIFIED with an explicit
    // count: band rows are ~50 B but the candidate join's cost is CPU,
    // so AQE's byte advisory would coalesce a million-signature corpus
    // into a handful of tasks (round-6 media-leg finding)
    assert(plan.contains("REPARTITION_BY_NUM"), plan.take(3000))
    // the pair dedup aggregates the REFINED (id_a, id_b, hamming)
    // rows — a signature-half column in the distinct keys means the
    // dedup moved back in front of the popcount filter and shuffles
    // every band-collision row again
    assert("(?s)HashAggregate\\(keys=\\[id_a[^\\]]*hamming".r
      .findFirstIn(plan).isDefined, plan.take(3000))
    assert("HashAggregate\\(keys=\\[[^\\]]*hi_a".r
      .findFirstIn(plan).isEmpty, plan.take(3000))
  }

  test("min-label CC: one action per round, bounded exchanges (round-5 barrier cut)") {
    // the round-5 contract: per round, the convergence metric rides the
    // materializing count() via Observation — so the WHOLE loop issues
    // exactly (1 init + rounds + 0) Dataset actions — and each round
    // performs one exchange (co-partitioned join over the
    // src-pre-partitioned edge cache + partitioning-preserving
    // truncation). A regression to the old shape (separate agg job per
    // round, re-shuffled edges, union+groupBy) breaks these counts.
    // Actions are counted via QueryExecutionListener (robust under AQE,
    // which splits one action into a job per query stage).
    import spark.implicits._
    val actions = new java.util.concurrent.atomic.AtomicInteger
    // DISTINCT shuffle-writing stage IDS, not completion events: a
    // contention-induced stage retry re-fires onStageCompleted with the
    // same stage id, and counting attempts instead of stages is exactly
    // the full-suite-load flake of rounds 5-6 (watch item #6) — the set
    // makes the exchange count retry-invariant while still failing on
    // any genuinely NEW exchange in the plan
    val shuffleStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = actions.incrementAndGet()
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    // stages are counted only when they belong to a SQL execution started
    // inside the measured window (jobs carry the execution id in their
    // properties; stage ids are announced by the job-start event before
    // any of those stages can complete) — an unrelated background job
    // writing shuffle data no longer pollutes the counter (round-5 ADVICE)
    val sqlStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val sl = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (j.properties != null &&
          j.properties.getProperty("spark.sql.execution.id") != null)
          j.stageIds.foreach(id => sqlStages.add(id))
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        // a stage that wrote shuffle data = one exchange executed
        if (sqlStages.contains(s.stageInfo.stageId) &&
          s.stageInfo.taskMetrics != null &&
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten > 0)
          shuffleStages.add(s.stageInfo.stageId)
    }
    // clique families → min-label confirms in exactly 1 loop round
    val pairs = (0 until 400).flatMap { f =>
      Seq((f * 3L, f * 3L + 1), (f * 3L, f * 3L + 2), (f * 3L + 1, f * 3L + 2))
    }.toDF("doc_a", "doc_b").cache()
    pairs.count() // materialize the input outside the counted window
    // drain the async listener bus BEFORE registering the counters: a
    // listener attached mid-backlog receives events POSTED before
    // registration (delivery snapshots the listener list at drain time,
    // not post time), so under full-suite load a previous test's stray
    // action/job event lands in the window and off-by-ones the exact
    // action count — the rounds-5/6/7 in-suite flake, deterministic fix
    org.apache.spark.graft.TestBusHook.waitUntilEmpty(spark.sparkContext)
    spark.listenerManager.register(ql)
    spark.sparkContext.addSparkListener(sl)
    try {
      val (labels, rounds) = TextOps.nearDupClustersStaged(pairs)
      // listener buses are async — drain them deterministically (every
      // triggering action has returned by here, so the queues only need
      // to empty; replaces the former load-sensitive sleep-polling)
      org.apache.spark.graft.TestBusHook.waitUntilEmpty(spark.sparkContext)
      // actions: the init count + one count per round, nothing else
      assert(actions.get == rounds + 1,
        s"expected ${rounds + 1} actions (init + $rounds round(s)), got ${actions.get}")
      // exchanges, measured exactly: 1 edge repartition + 1 per-count
      // final exchange for the init, then 1 groupBy(dst) + 1 count
      // exchange per round = 2 + 2·rounds. The bound adds one stage of
      // slack per phase so a benign Spark/AQE planning change doesn't
      // fail the suite; the old shape (edges re-shuffled every round +
      // union+groupBy re-exchange + a separate agg job) still blows it
      val bound = 3 + rounds * 3
      assert(shuffleStages.size <= bound,
        s"expected <= $bound shuffle map stages for $rounds round(s), " +
          s"got ${shuffleStages.size}")
      assert(labels.count() == 1200)
    } finally {
      spark.listenerManager.unregister(ql)
      spark.sparkContext.removeSparkListener(sl)
      pairs.unpersist()
      spark.catalog.clearCache()
    }
  }

  test("decontamination joins broadcast the benchmark-shingle side") {
    import spark.implicits._
    val docs = (0 until 200)
      .map(i => (i.toLong, s"a$i b$i c$i d$i e$i")).toDF("doc_id", "text")
    val bench = (0 until 5)
      .map(i => (1000L + i, s"a$i b$i c$i x y")).toDF("doc_id", "text")
    val plan = TextOps.contaminationReport(docs, bench, k = 3)
      .queryExecution.executedPlan.toString
    // the eval set is the small side by contract — a sort-merge join
    // here would shuffle the whole corpus shingle relation on long
    // string keys (the round-2 keep-join regression shape)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    // the REDACT arm (round 6) must keep the same shape: bench shingles
    // and the hot set broadcast; the positional corpus shingle stream
    // must never be the build/shuffle side of a sort-merge join
    val redactPlan = TextOps.decontaminateRedact(docs, bench, k = 3)
      .queryExecution.executedPlan.toString
    assert(redactPlan.contains("BroadcastHashJoin"), redactPlan.take(2000))
    assert(!redactPlan.contains("SortMergeJoin"), redactPlan.take(2000))
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
