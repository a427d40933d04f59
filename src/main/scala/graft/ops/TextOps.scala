package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Large-scale training-data text pipeline operators over the `documents`
  * table (`doc_id: long, text: string, lang: string, source: string,
  * n_chars: long`).
  *
  * Design notes for 100 TB scale:
  *  - Everything is declarative DataFrame ops → whole-stage codegen; no
  *    Scala UDFs, no driver-side collects.
  *  - All hashing is `md5` over strings so the DuckDB oracle reproduces
  *    results byte-for-byte (Spark's `hash()` is murmur3 and engine
  *    specific; md5 is standard).
  *  - All cross-checked aggregates are integer-valued or order-identical
  *    left-folds (see VectorOps) so floating point is deterministic.
  *  - Pairwise ops (jaccard, minhash candidates) shuffle on content keys
  *    (shingle / band signature), never materialize N² — the only N² op
  *    is the brute-force ANN *baseline* in VectorOps.
  *  - Cache lifecycle: the pair operators cache intermediates consumed by
  *    multiple plan branches (measured 2-4× recompute without). The
  *    returned DataFrame is lazy, so the operator cannot unpersist them
  *    itself — long-lived sessions issuing many ad-hoc pair queries
  *    should `spark.catalog.clearCache()` between logical jobs (as
  *    graft.Bench does) or unpersist via the catalog.
  */
object TextOps {

  /** Tokenization shared by all ops: text is single-space separated. */
  private def words(text: Column): Column = split(text, " ")

  /** Distinct word k-shingles, one row per (doc_id, shingle). Docs with
    * fewer than k tokens yield no shingles (guard needed because Spark's
    * `sequence(1, 0)` counts DOWN rather than producing an empty array).
    */
  def shingles(docs: DataFrame, k: Int): DataFrame = {
    val w = col("w")
    val sh = transform(sequence(lit(1), size(w) - (k - 1)),
      i => concat_ws(" ", (0 until k).map(d => element_at(w, i + d)): _*))
    docs.select(col("doc_id"), words(col("text")).as("w"))
      .where(size(w) >= k)
      .select(col("doc_id"), explode(array_distinct(sh)).as("s"))
  }

  /** Exact duplicate grouping by content hash. Scale: single hash
    * aggregate, partial+final map-side combine for free.
    */
  def dedupExact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))

  /** Default hot-shingle document-frequency cap: shingles appearing in
    * more than this many documents (stop-phrase shingles — the skew bomb
    * of any shingle-keyed pair join at 100 TB) are dropped from the
    * similarity measure. A shingle shared by >1000 docs carries no
    * near-duplicate signal but creates ≥ df²/2 join pairs.
    */
  val DefaultMaxShingleDf = 1000L

  /** `shingles` with the document-frequency cap applied (one extra
    * partial-aggregated pass over the shingle key).
    */
  def cappedShingles(docs: DataFrame, k: Int, maxDf: Long): DataFrame = {
    val sh = shingles(docs, k)
    // anti-join against the HOT set (df > maxDf): |hot| ≤ shingleRows /
    // maxDf by pigeonhole, and real df distributions are heavy-tailed so
    // it is far smaller — broadcast means the full shingle relation is
    // never shuffled for the cap. (Round-2 regression: joining against
    // the `df <= maxDf` KEEP set — nearly all shingles — was a full
    // sort-merge join keyed on long strings: 46 s of an 88.7 s bench.)
    // If a pathological corpus makes hot exceed broadcast limits, raise
    // maxDf (the cap is a skew guard, not a similarity parameter) or
    // drop the broadcast hint and let AQE pick the join.
    val hot = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("s")
    sh.join(broadcast(hot), Seq("s"), "left_anti")
  }

  /** Exact shingle-Jaccard for an explicit pair list: computes n_a, n_b
    * and the co-shingle counts ONLY over the docs appearing in `pairs`
    * (semi-join on doc id) — the filter-refine contract that keeps LSH
    * refinement proportional to the candidate set, not the corpus.
    *
    * The co-shingle count is PAIR-DRIVEN: each pair fans out over
    * doc_a's shingles, then equi-joins (doc_b, s) — intermediate rows ∝
    * |pairs| × shingles/doc. The pre-round-8 shape (self-join of candSh
    * on the shingle key restricted to pairs AFTERWARDS) was Σ_s df_s² in
    * the intermediate: on a dense shingle space where every shingle sits
    * near the df cap it materialized ~10^10 rows at 500k docs and OOM'd
    * the sf10 stress leg (BenchSf1) while the true candidate set was
    * only 4.2M pairs. Both shapes compute the identical |A∩B| (shingles
    * are distinct per doc); only the join order changed.
    */
  private def jaccardForPairs(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val candDocs = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    // cached: consumed by both legs of the pair-driven join and the
    // per-doc counts — without this the upstream LSH pipeline recomputes
    // once per consumer (measured 2× bench regression)
    val candSh = sh.join(candDocs, "doc_id").cache()
    val cnt = candSh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = pairs
      .join(candSh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(candSh.as("b"),
        col("doc_b") === col("b.doc_id") && col("a.s") === col("b.s"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs.join(common, Seq("doc_a", "doc_b"))
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(
        col("doc_a"), col("doc_b"), col("n_common"),
        col("ca.n").as("n_a"), col("cb.n").as("n_b"),
        (col("n_common").cast("double") /
          (col("ca.n") + col("cb.n") - col("n_common")).cast("double")).as("jaccard"))
  }

  /** N-gram (word 3-shingle) Jaccard near-duplicate pairs with
    * similarity >= minJaccard — the EXACT VERIFIER, not the production
    * near-dup path. Shuffles on shingle (content key), so two
    * near-identical docs meet without an N² join; hot shingles are capped
    * by `maxDf` (so a stop-phrase shingle cannot explode the pair join).
    *
    * Scale contract: even capped, the co-shingle self-join costs Σ(df²)
    * over all shingles — fine for calibration corpora, wrong as the
    * default at corpus scale. The production operator is
    * [[minhashLshPairs]] (candidate-only refine). `maxDocs` enforces
    * this: the call fails fast (one cheap count, before the expensive
    * join is launched) when the input exceeds the calibration bound.
    * Pass `maxDocs = None` to explicitly opt in to a large exact run.
    */
  def ngramJaccardPairs(docs: DataFrame, k: Int = 3, minJaccard: Double = 0.8,
                        maxDf: Long = DefaultMaxShingleDf,
                        maxDocs: Option[Long] = Some(1000000L)): DataFrame = {
    maxDocs.foreach { cap =>
      // limit-probe, not a full count: scans only until cap+1 rows are
      // found, so the guard costs O(cap) rows even on a huge input (and
      // plan construction never pays a whole-pipeline materialization).
      // limit() takes an Int, so caps that don't fit fall back to the
      // exact count — a clamped probe could never exceed such a cap and
      // would silently disable the guard.
      val over =
        if (cap >= Int.MaxValue) docs.count() > cap
        else docs.select(lit(1).as("one")).limit(cap.toInt + 1).count() > cap
      require(!over,
        s"ngramJaccardPairs is the exact all-pairs VERIFIER (cost Σdf²); " +
          s"input exceeds maxDocs=$cap. Use minhashLshPairs as the " +
          "production near-dup operator, or pass maxDocs = None to opt in.")
    }
    val sh = cappedShingles(docs, k, maxDf).cache()
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(
        col("doc_a"), col("doc_b"), col("n_common"),
        col("ca.n").as("n_a"), col("cb.n").as("n_b"),
        (col("n_common").cast("double") /
          (col("ca.n") + col("cb.n") - col("n_common")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** `numHashes` independent min-hashes as ONE wide partial-aggregated
    * pass: hash h is the 8-hex-char (32-bit) slice `(h%4)*8+1 .. +8` of
    * md5((h/4) || '|' || shingle) — ceil(numHashes/4) digests per
    * shingle row instead of numHashes (the md5 allocation rate was the
    * measured single-JVM scaling bottleneck of the whole minhash
    * pipeline, BENCH/BASELINE.md round-3), and the agg/shuffle carries
    * 8-char strings instead of 32. 32-bit minwise hashes are standard
    * for banding; candidate inflation from slice collisions is absorbed
    * by the exact-Jaccard refine. Hex-string min = numeric min (fixed
    * width). The DuckDB oracle mirrors the same substr(md5(...))
    * formula byte-for-byte.
    */
  private def minhashWide(sh: DataFrame, numHashes: Int): DataFrame = {
    val nDigests = (numHashes + 3) / 4
    val digestCols = (0 until nDigests).map(p =>
      md5(concat(lit(s"$p|"), col("s")).cast("binary")).as(s"h$p"))
    val hashed = sh.select(col("doc_id") +: digestCols: _*)
    val aggCols = (0 until numHashes).map(h =>
      min(substring(col(s"h${h / 4}"), (h % 4) * 8 + 1, 8)).as(s"m$h"))
    hashed.groupBy("doc_id").agg(aggCols.head, aggCols.tail: _*)
  }

  /** MinHash signatures in exploded (doc_id, h, m) form — see
    * [[minhashWide]] for the hash-family definition.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 3, numHashes: Int = 8,
                        maxDf: Long = DefaultMaxShingleDf): DataFrame = {
    val wide = minhashWide(cappedShingles(docs, k, maxDf), numHashes)
    wide.select(col("doc_id"),
        explode(array((0 until numHashes).map(h =>
          struct(lit(h).as("h"), col(s"m$h").as("m"))): _*)).as("x"))
      .select(col("doc_id"), col("x.h").as("h"), col("x.m").as("m"))
  }

  /** MinHash-LSH near-dup candidate pairs, verified with exact Jaccard.
    * Bands of `rowsPerBand` minhashes; docs sharing any full band
    * signature become candidates (shuffle key = band signature, so the
    * join is an equi-join — broadcastable when the candidate side is
    * small, AQE otherwise). Candidates are then verified with the exact
    * shingle-Jaccard (filter-refine).
    */
  def minhashLshPairs(docs: DataFrame, k: Int = 3, numHashes: Int = 8,
                      rowsPerBand: Int = 2, minJaccard: Double = 0.5,
                      maxDf: Long = DefaultMaxShingleDf): DataFrame = {
    val (sh, cand) = minhashLshCandidateStage(docs, k, numHashes, rowsPerBand, maxDf)
    // exact-Jaccard refine over the CANDIDATE pairs only (round-1 fix:
    // refining via the full-corpus all-pairs join made the banding
    // pointless — this recomputes co-shingle counts only for docs that
    // appear in at least one candidate pair)
    jaccardForPairs(cand, sh)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** banding stage of [[minhashLshPairs]] (shared with the probe tool):
    * returns (cached capped shingles, cached candidate pairs).
    */
  private[graft] def minhashLshCandidateStage(
      docs: DataFrame, k: Int, numHashes: Int, rowsPerBand: Int,
      maxDf: Long): (DataFrame, DataFrame) = {
    val sh = cappedShingles(docs, k, maxDf).cache()
    // all `numHashes` min-hashes in ONE partial-aggregated pass (same m
    // values as minhashSignatures — see minhashWide for the 2-digest
    // 32-bit-slice hash family and why). CACHED (~1 narrow row per doc):
    // the band self-join below consumes `bands` on both sides, and when
    // AQE plans it as a broadcast join the two sides no longer share an
    // exchange — without the cache each side re-runs the whole
    // shingle→minhash aggregation (measured ~0.6 s of a 3.3 s sf0.1
    // wall, and one full extra corpus pass at scale)
    val sigs = minhashWide(sh, numHashes).cache()
    // ceil-divide so a trailing partial band still participates when
    // numHashes % rowsPerBand != 0 (parity with the floor(h/rows) banding)
    val nBands = (numHashes + rowsPerBand - 1) / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      val hs = (b * rowsPerBand) until math.min(numHashes, (b + 1) * rowsPerBand)
      struct(lit(b).as("b"),
        concat_ws(",", hs.map(h => col(s"m$h")): _*).as("sig"))
    }
    val bands = sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.b").as("b"), col("bs.sig").as("sig"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .cache() // tiny; referenced by candDocs AND the final pair join
    (sh, cand)
  }

  /** candidate pairs only — probe/diagnostic surface (MinhashProbe). */
  private[graft] def minhashLshCandidates(docs: DataFrame, k: Int = 3,
                                          numHashes: Int = 8,
                                          rowsPerBand: Int = 2,
                                          maxDf: Long = DefaultMaxShingleDf): DataFrame =
    minhashLshCandidateStage(docs, k, numHashes, rowsPerBand, maxDf)._2

  /** Connected-component clustering of near-duplicate PAIRS into keep
    * groups: every doc transitively connected through `pairs` gets the
    * component-minimum doc_id as `keep_id` — the "keep one canonical doc
    * per duplicate cluster" step a dedup pipeline runs after pair
    * generation. Iterative min-label propagation: each round every node
    * takes the min label over itself and its neighbours — ONE shuffle
    * and ONE job per round (edges are pre-partitioned on the join key,
    * label lineage truncation preserves partitioning, and the monotone
    * label-sum convergence metric rides the materializing action via
    * `Observation`). Plain propagation needs
    * component-diameter rounds — near-dup components are small cliques
    * by construction (1-2 rounds); a pipeline facing adversarial long
    * chains should swap in large-star/small-star, which keeps this
    * exact join shape but converges in O(log n). Throws if `maxIters`
    * is exhausted before convergence (a silently partial keep_id is
    * worse than a loud failure). Docs in no pair are absent (they
    * trivially keep themselves).
    */
  def nearDupClusters(pairs: DataFrame, maxIters: Int = 12): DataFrame =
    nearDupClustersStaged(pairs, maxIters)._1

  /** LOGICAL-PLAN truncation for the iterative CC algorithms: wrap the
    * cached result as a LogicalRDD leaf. Without this each round's plan
    * nests the previous round's (join chain) with the whole pair
    * pipeline at the leaves — exponential driver-side analysis
    * (measured: 114 s of plan work for ~12 s of compute at 200k docs).
    * Round 5: the wrap PRESERVES output partitioning (and stays in
    * InternalRow), so a round keyed like the previous one reuses its
    * shuffle instead of re-exchanging — see
    * [[org.apache.spark.sql.graft.PlanUtils.truncatePreservingPartitioning]].
    * Unlike localCheckpoint, the RDD lineage stays intact, so blocks are
    * recomputable on executor loss and caches remain unpersistable per
    * round. Shared by BOTH implementations so their executor-loss
    * behavior cannot diverge.
    */
  private def truncate(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.PlanUtils.truncatePreservingPartitioning(df)

  /** decimal(38,0) sum — label/endpoint checksums overflow a long sum at
    * corpus-scale id ranges
    */
  private def decSum(c: Column): Column = sum(c.cast("decimal(38,0)"))

  /** read a decimal metric off a completed [[Observation]] (SQL sum over
    * zero rows is NULL — normalize so empty inputs don't NPE)
    */
  private def obsDecimal(o: org.apache.spark.sql.Observation,
                         key: String): java.math.BigDecimal =
    o.get(key) match {
      case null => java.math.BigDecimal.ZERO
      case d: java.math.BigDecimal => d
      case d: scala.math.BigDecimal => d.bigDecimal
      case other => new java.math.BigDecimal(other.toString)
    }

  /** [[nearDupClusters]] plus the number of propagation rounds it took
    * to CONFIRM convergence — exposed so the scaling bench can record
    * rounds-to-converge alongside rows/s (near-dup components are small
    * cliques, so this should stay 1-2 regardless of corpus size; growth
    * with input would signal chain-shaped duplicate graphs that want the
    * large-star/small-star variant instead).
    */
  private[graft] def nearDupClustersStaged(
      pairs: DataFrame, maxIters: Int = 12): (DataFrame, Int) = {
    import org.apache.spark.sql.Observation
    // both edge directions in ONE pass over `pairs` (a union of two
    // projections references — and recomputes — the whole upstream pair
    // pipeline twice). Repartitioned ON src BEFORE caching: every round
    // joins edges on src, and the cached hash partitioning satisfies
    // that clustering, so the (large) edge relation is shuffled exactly
    // ONCE for the whole loop instead of once per round (round-5 barrier
    // cut; truncate preserves the labels side's partitioning likewise).
    // EXPLICIT partition count: an N-less repartition(col) leaves AQE
    // free to re-plan the shuffle, which would falsify the static
    // hash-partitioning the truncation records before materialization
    val nPart = pairs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val edgesCache = pairs
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(nPart, col("src"))
      .cache()
    val edges = truncate(edgesCache)
    // round 0 folded into the init: lbl = min(self, direct neighbours);
    // groupBy(src) over the src-partitioned cache needs no exchange.
    // Convergence metric (the label sum) rides the SAME materializing
    // action via Observation — the separate per-round agg job is gone
    // (round-5: per round = ONE job, ONE exchange).
    // grouped on the RAW src column (not an alias): HashAggregate
    // demands clustering on its grouping expressions, and an alias is a
    // new attribute the cached hash partitioning doesn't satisfy — the
    // aliased form re-exchanged the whole edge relation (measured);
    // renaming AFTER the agg keeps the exchange-free plan (alias-aware
    // output partitioning maps src → doc_id for the downstream joins)
    var labelsCache = edges.groupBy("src")
      .agg(least(col("src"), min(col("dst"))).as("lbl"))
      .withColumnRenamed("src", "doc_id")
      .cache()
    val obs0 = Observation()
    val n0 = labelsCache.observe(obs0, decSum(col("lbl")).as("s")).count()
    var labels = truncate(labelsCache)
    // labels only ever DECREASE under min-propagation, so the label sum
    // is strictly monotone while anything changes — equal consecutive
    // sums confirm the fixpoint
    var prevSum = obsDecimal(obs0, "s")
    var converged = n0 == 0L
    var it = 0
    while (!converged && it < maxIters) {
      // each node's incoming neighbour-label minimum: edges(src-
      // partitioned) ⋈ labels(doc_id-partitioned, alias-preserved) is
      // exchange-free; the groupBy(dst) is the round's ONE shuffle
      val viaNbrMin = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min(col("lbl")).as("nlbl"))
      // inner join is total: every node is some edge's dst (edges are
      // bidirectional), so viaNbrMin covers the whole label universe
      val nextCache = labels.join(viaNbrMin, Seq("doc_id"))
        .select(col("doc_id"), least(col("lbl"), col("nlbl")).as("lbl"))
        .cache()
      val o = Observation()
      nextCache.observe(o, decSum(col("lbl")).as("s")).count()
      // lineage truncation per round — see the edges note above; the
      // PREVIOUS round's cache is released once the new round is
      // materialized (its RDD lineage can still recompute through the
      // unpersisted InMemoryRelation if an executor is lost)
      val next = truncate(nextCache)
      val nextSum = obsDecimal(o, "s")
      labelsCache.unpersist(false)
      labelsCache = nextCache
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      it += 1
    }
    edgesCache.unpersist(false)
    if (!converged)
      throw new IllegalStateException(
        s"nearDupClusters could not CONFIRM convergence within $maxIters " +
          "rounds: a component has graph diameter >= maxIters (the labels " +
          "may already be minimal but are unverified). Raise maxIters, or " +
          "use a large-star/small-star contraction for adversarial " +
          "chain-shaped duplicate graphs.")
    (labels.select(col("doc_id"), col("lbl").as("keep_id")), it)
  }

  /** Connected components via alternating LARGE-STAR / SMALL-STAR
    * contractions ("Connected Components in MapReduce and Beyond",
    * Kiveris et al., SoCC '14) — the scale path for ADVERSARIAL
    * duplicate graphs: min-label propagation ([[nearDupClusters]])
    * needs component-diameter rounds, star contraction converges in
    * O(log n) rounds on ANY component shape (a 1000-node chain: ~10
    * rounds vs 1000). Same output contract, bit-identical result:
    * `(doc_id, keep_id = component-minimum doc_id)` — the driver gate
    * checks both against the same transitive-closure oracle.
    *
    * Round shape — every step is a window-min or distinct over ONE
    * shuffle key; adjacency is never materialized as an array, so a
    * high-degree hub costs a window aggregate, not a collect_list in
    * one task's heap:
    *  - large-star: over the undirected adjacency, each node's
    *    strictly-larger neighbours re-attach to the minimum of its
    *    closed neighbourhood;
    *  - small-star: over the larger→smaller edges grouped by the larger
    *    endpoint, the node and its smaller neighbours re-attach to
    *    their minimum.
    * Edges always point DOWNWARD (hi > lo). Termination is an EXACT
    * star-forest test after each round (the algorithm's fixpoints are
    * precisely star forests — see the in-loop proof sketch): one cheap
    * aggregate over the new edge set, detecting convergence in the
    * same round that forms the stars (round 5 — the former
    * checksum-stability + `except` confirmation needed one whole extra
    * contraction round to observe stability). Lineage
    * is truncated per round like [[nearDupClusters]] (LogicalRDD wrap —
    * recomputable on executor loss, caches releasable). Throws if
    * `maxIters` rounds cannot reach the fixpoint.
    */
  def nearDupClustersLargeStar(pairs: DataFrame, maxIters: Int = 25): DataFrame =
    nearDupClustersLargeStarStaged(pairs, maxIters)._1

  /** [[nearDupClustersLargeStar]] plus its rounds-to-converge count. */
  private[graft] def nearDupClustersLargeStarStaged(
      pairs: DataFrame, maxIters: Int = 25): (DataFrame, Int) = {
    // ONE pass over `pairs` (the upstream pair pipeline is expensive):
    // canonical hi>lo edges + the node universe both derive from it
    val canonicalCache = pairs.select(
        greatest(col("doc_a"), col("doc_b")).as("hi"),
        least(col("doc_a"), col("doc_b")).as("lo"))
      .distinct().cache()
    val canonical = truncate(canonicalCache)
    // every doc in ANY pair (incl. degenerate self-pairs) gets an output
    // row, matching nearDupClusters
    val nodes = canonical
      .select(explode(array(col("hi"), col("lo"))).as("doc_id")).distinct()
    var edgesCache = canonicalCache
    var edges = canonical.where(col("hi") =!= col("lo"))
    // EXACT termination test (round 5 — replaces the round-4 checksum
    // stability signal + `except` confirmation, which cost one ENTIRE
    // extra contraction round to observe stability plus a full-width
    // set difference): the alternating algorithm's fixpoints are
    // precisely the STAR FORESTS centered at component minima (Kiveris
    // et al. §3), and "star forest" is locally checkable in ONE cheap
    // aggregate over the (distinct, hi>lo) edge set —
    //   (a) no node is both a hi and a lo, and
    //   (b) no hi carries two edges.
    // ⇐: such a set is stars centered at the lo nodes (each < its
    // leaves), and a star is stable under both contractions.
    // ⇒: a hi with two los is rewritten by small-star; a node that is
    // both hi and lo is re-attached by large-star — either way not a
    // fixpoint. So the test is exact, converges one round EARLIER than
    // stability detection (the round that FORMS the stars also detects
    // them), and a star-shaped input converges with zero rounds.
    def isStarForest(df: DataFrame): Boolean =
      df.select(col("hi").as("node"), lit(1L).as("h"), lit(0L).as("l"))
        .unionByName(df.select(col("lo").as("node"), lit(0L).as("h"), lit(1L).as("l")))
        .groupBy("node")
        .agg(sum("h").as("nh"), sum("l").as("nl"))
        .where(col("nh") > 1L || (col("nh") > 0L && col("nl") > 0L))
        .isEmpty
    var converged = isStarForest(edges)
    var it = 0
    while (!converged && it < maxIters) {
      // large-star over the undirected adjacency (both directions in one
      // explode pass — a union of two projections would recompute the
      // upstream twice)
      val bi = edges.select(explode(array(
          struct(col("hi").as("u"), col("lo").as("v")),
          struct(col("lo").as("u"), col("hi").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
      // NOT deduped before the small-star window (round-5 barrier cut):
      // m = min(closed nbhd of u) ≤ u < v, so hi > lo holds by
      // construction (the old hi≠lo filter was vacuous), and a window
      // MIN is duplicate-insensitive — the former distinct() bought
      // nothing but an extra exchange+aggregate per round. Input edges
      // are distinct, so rows here = |edges| exactly (one per kept
      // direction); duplicate (hi, m) rows from different u-partitions
      // are collapsed by the post-small-star distinct below.
      val ls = bi
        .withColumn("m", least(min(col("v")).over(Window.partitionBy("u")), col("u")))
        .where(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
      // small-star on the downward edges, grouped by the larger endpoint
      // — both outputs in ONE explode pass over ssBase (a union of two
      // projections would plan and execute the large-star window subtree
      // twice per round, the recompute pitfall the `bi` explode avoids)
      val ssBase = ls.withColumn("m", min(col("lo")).over(Window.partitionBy("hi")))
      val next = ssBase.select(explode(array(
          struct(col("lo").as("hi"), col("m").as("lo")),
          struct(col("hi").as("hi"), col("m").as("lo")))).as("e"))
        .select(col("e.hi").as("hi"), col("e.lo").as("lo"))
        .where(col("hi") =!= col("lo"))
        .distinct()
      val nextCache = next.cache()
      nextCache.count() // materialize (one action; the star test below
      // scans the cache, not the pipeline)
      val nextT = truncate(nextCache)
      converged = isStarForest(nextT)
      // round 1 starts with edgesCache == canonicalCache, which `nodes`
      // (and through it the returned labels) still reads — unpersisting
      // it would recompute the whole upstream pair pipeline when the
      // caller materializes the result (round-4 review finding)
      if (edgesCache ne canonicalCache) edgesCache.unpersist(false)
      edgesCache = nextCache
      edges = nextT
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"nearDupClustersLargeStar could not CONFIRM the fixpoint within " +
          s"$maxIters rounds — raise maxIters (star contraction converges " +
          "in O(log n) rounds, so this indicates a pathological input or " +
          "too small a bound).")
    // at the fixpoint the edges are stars centered at each component's
    // minimum: label every hi with its (unique) center, centers and
    // isolated self-pair docs keep themselves
    val labels = nodes
      .join(edges.groupBy("hi").agg(min("lo").as("__keep")),
        nodes("doc_id") === col("hi"), "left")
      .select(col("doc_id"), coalesce(col("__keep"), col("doc_id")).as("keep_id"))
    // canonicalCache stays cached: `nodes` (and through it the returned
    // labels) still reads it — unpersisting here would recompute the
    // whole upstream pair pipeline at materialization. Callers release
    // via spark.catalog.clearCache() per the class cache-lifecycle note.
    (labels, it)
  }

  /** Positional word `k`-shingles — one row per position `pos` (1-based),
    * NOT deduplicated within a doc (unlike [[shingles]]): the substring-
    * dedup runs below need every occurrence's position.
    */
  private def positionalShingles(docs: DataFrame, k: Int): DataFrame = {
    val w = col("w")
    docs.select(col("doc_id"), words(col("text")).as("w"))
      .where(size(w) >= k)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(w) - (k - 1)),
        i => struct(i.as("pos"),
          concat_ws(" ", (0 until k).map(d => element_at(w, i + d)): _*).as("s"))))
        .as("x"))
      .select(col("doc_id"), col("x.pos").as("pos"), col("x.s").as("s"))
  }

  /** EXACT-SUBSTRING (paragraph-level) repeated spans — the dedup
    * modality whole-document shingle similarity cannot see: a ≥
    * `minWords`-word passage repeated verbatim across otherwise-distinct
    * docs (boilerplate headers, licence blocks, templated paragraphs —
    * the modality of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", whose suffix-array ExactSubstr this
    * re-expresses relationally). Emits one row per maximal repeated
    * span occurrence: `(doc_id, start_w, end_w, n_words, passage_md5)`
    * with 1-based inclusive WORD offsets and the md5 of the passage
    * text as the cluster id (identical passages in different docs share
    * it).
    *
    * Algorithm — anchor shingles + diagonal-run extension, all
    * content-keyed equi-joins and windows (never all-pairs):
    *  1. positional `k`-shingles per doc, hot values (total occurrences
    *     > `maxDf`) dropped by broadcast anti-join — the usual skew
    *     guard: a boilerplate shingle occurring o times fans the anchor
    *     join o² ways, and at k≈50 a hot shingle is pure template noise;
    *  2. anchors: self-equi-join on the shingle VALUE (`doc_a < doc_b`)
    *     → matching positions (pa, pb);
    *  3. a shared passage of L words appears as L−k+1 anchors on one
    *     DIAGONAL (pa − pb constant) at consecutive pa — per
    *     (doc_a, doc_b, diagonal), consecutive runs are islands of
    *     pa − row_number() (one window shuffle keyed by the pair, sized
    *     by matches, not by the corpus);
    *  4. a maximal run [p0, p1] covers words p0 .. p1+k−1 in doc_a (and
    *     shifted by the diagonal in doc_b); runs shorter than `minWords`
    *     are dropped; both sides are emitted in one explode pass and
    *     deduplicated (the same span is found once per partner doc).
    *
    * Differences from suffix-array ExactSubstr, by construction: matches
    * are word-aligned and only detectable at ≥ `k` words (`minWords ≥ k`
    * enforced) — at the customary k≈50 both are the semantics a
    * training pipeline wants anyway.
    *
    * Scale shape: shuffle keys are shingle value → (doc pair, diagonal)
    * → doc_id; each relation is proportional to matches after the DF
    * cap, never N². The passage hash joins spans (small) back to the
    * doc words once, equi-keyed on doc_id.
    */
  def repeatedSpans(docs: DataFrame, k: Int = 50, minWords: Int = 50,
                    maxDf: Long = DefaultMaxShingleDf): DataFrame = {
    val runs = repeatedSpanRuns(docs, k, minWords, maxDf)
    val spans = runs.select(explode(array(
        struct(col("da").as("doc_id"), col("a0").as("start_w"), col("a1").as("end_w")),
        struct(col("db").as("doc_id"), (col("a0") - col("diag")).as("start_w"),
          (col("a1") - col("diag")).as("end_w")))).as("sp"))
      .select(col("sp.doc_id"), col("sp.start_w"), col("sp.end_w"))
      .distinct()
    spans.join(docs.select(col("doc_id"), words(col("text")).as("w")), "doc_id")
      .select(col("doc_id"),
        col("start_w").cast("long").as("start_w"),
        col("end_w").cast("long").as("end_w"),
        (col("end_w") - col("start_w") + 1).cast("long").as("n_words"),
        md5(concat_ws(" ",
          slice(col("w"), col("start_w"), col("end_w") - col("start_w") + 1))
          .cast("binary")).as("passage_md5"))
  }

  /** maximal diagonal runs (da < db): one row per
    * (da, db, diag, a0, a1) where words a0..a1 of da equal words
    * a0−diag..a1−diag of db. Shared by [[repeatedSpans]] (both-side
    * span table) and [[stripRepeatedSpans]] (db-side strips).
    */
  private def repeatedSpanRuns(docs: DataFrame, k: Int, minWords: Int,
                               maxDf: Long): DataFrame = {
    require(minWords >= k,
      s"minWords ($minWords) must be >= the anchor shingle size k ($k): " +
        "matches shorter than k produce no anchors and cannot be detected")
    // anchors are keyed by the 16-BYTE md5 of the shingle, not the raw
    // string: at the production k≈50 a shingle is ~350 chars, so the
    // fixed-width digest shrinks the shuffled/sorted/cached relation
    // ~20× and turns the self-join sort into cheap binary comparisons
    // (measured at k=5/1M docs: the raw-string form was allocation-
    // bound — 32c no faster than 8c with 1.7× run variance). Equality
    // of md5 ⟺ equality of the shingle up to md5 collisions, absent in
    // practice (2⁻¹²⁸-scale, no adversary); the DuckDB oracle joins the
    // raw strings, so a collision would surface as a hash mismatch.
    val sh0 = positionalShingles(docs, k)
      .select(col("doc_id"), col("pos"), unhex(md5(col("s").cast("binary"))).as("h"))
    // hot cap on TOTAL occurrences (not doc-frequency like cappedShingles):
    // the anchor join fans out per occurrence pair, so occurrences are
    // what the skew guard must bound
    val hot = sh0.groupBy("h").agg(count(lit(1)).as("n"))
      .where(col("n") > maxDf).select("h")
    val sh = sh0.join(broadcast(hot), Seq("h"), "left_anti")
      // cached: both sides of the anchor self-join read it — without
      // this the shingle pipeline (and its cap aggregate) runs twice
      .cache()
    val anch = sh.as("a")
      .join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("a.pos").as("pa"),
        col("b.doc_id").as("db"), col("b.pos").as("pb"))
    val wDiag = Window.partitionBy(col("da"), col("db"), col("diag")).orderBy(col("pa"))
    anch.withColumn("diag", col("pa") - col("pb"))
      .withColumn("isl", col("pa") - row_number().over(wDiag))
      .groupBy("da", "db", "diag", "isl")
      .agg(min("pa").as("a0"), max("pa").as("a1m"))
      .where(col("a1m") - col("a0") + k >= minWords)
      .select(col("da"), col("db"), col("diag"),
        col("a0"), (col("a1m") + (k - 1)).as("a1"))
  }

  /** merge overlapping-or-adjacent per-doc word intervals — classic
    * window island detection (ordered by start, new island when start
    * exceeds the running max end + 1). One window + one aggregate, both
    * keyed by doc_id.
    */
  private def mergeWordIntervals(spans: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("start_w"), col("end_w"))
    val prevMax = max(col("end_w")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    spans
      .withColumn("nw", when(prevMax.isNull || col("start_w") > prevMax + 1, 1)
        .otherwise(0))
      .withColumn("isl", sum(col("nw")).over(w))
      .groupBy("doc_id", "isl")
      .agg(min("start_w").as("start_w"), max("end_w").as("end_w"))
      .select("doc_id", "start_w", "end_w")
  }

  /** [[repeatedSpans]]'s enforcement arm: every repeated span is
    * STRIPPED from the higher-id doc of each matching pair (the lowest
    * doc id keeps the canonical occurrence — same keep-the-minimum
    * convention as every dedup operator here), overlapping strips
    * merged per doc, and the doc re-emitted with the covered words
    * removed (remaining words joined by single spaces, preserving the
    * class-level text contract). All original columns are preserved
    * with `text` replaced; `n_words_removed` is appended.
    *
    * Scale shape: [[repeatedSpanRuns]] (content-keyed, see there) + one
    * doc_id-keyed interval merge + one equi-join of the (small) strip
    * intervals back onto the corpus; the word filtering itself is a
    * narrow per-row higher-order function — no word-level shuffle.
    */
  def stripRepeatedSpans(docs: DataFrame, k: Int = 50, minWords: Int = 50,
                         maxDf: Long = DefaultMaxShingleDf): DataFrame =
    applyWordStrips(docs,
      repeatedSpanRuns(docs, k, minWords, maxDf)
        .select(col("db").as("doc_id"), (col("a0") - col("diag")).as("start_w"),
          (col("a1") - col("diag")).as("end_w"))
        .distinct())

  /** remove the words covered by `strips` (`(doc_id, start_w, end_w)`,
    * 1-based inclusive, overlaps allowed — they are interval-merged
    * here) from each doc, rebuilding `text` from the surviving words
    * (single-space joined, preserving the class text contract). All
    * original columns are kept with `text` replaced; `n_words_removed`
    * is appended. The filtering is a narrow per-row higher-order
    * function over the (few) merged intervals of that doc — no
    * word-level shuffle; the only shuffles are the doc_id-keyed
    * interval merge and the equi-join of the (small) strip set onto
    * the corpus.
    */
  /** tight-loop word stripper: walks the words once against the SORTED
    * disjoint intervals with a moving pointer — O(words + intervals)
    * per doc. A Scala UDF on purpose: the declarative form
    * (`filter(w, (x,i) => !exists(iv, …))`) evaluates an interpreted
    * lambda per word × interval and measured ~40 s of a 77 s wall at
    * 1M docs (the round-3 primitive-loop-vs-higher-order lesson, same
    * ~20× ratio). Output text joins survivors with single spaces —
    * byte-identical to the `concat_ws` form and the oracle's
    * `string_agg`.
    */
  private val stripWordsUdf = udf((w: Seq[String], iv: Seq[org.apache.spark.sql.Row]) => {
    val sorted = iv.map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1)
    val sb = new java.lang.StringBuilder
    var removed = 0
    var j = 0
    var i = 0
    while (i < w.length) {
      val pos = i + 1
      while (j < sorted.length && sorted(j)._2 < pos) j += 1
      if (j < sorted.length && sorted(j)._1 <= pos && pos <= sorted(j)._2) removed += 1
      else {
        if (sb.length > 0) sb.append(' ')
        sb.append(w(i))
      }
      i += 1
    }
    (sb.toString, removed)
  })

  private def applyWordStrips(docs: DataFrame, strips: DataFrame): DataFrame = {
    val iv = mergeWordIntervals(strips).groupBy("doc_id")
      .agg(collect_list(
        struct(col("start_w").cast("int").as("start_w"),
          col("end_w").cast("int").as("end_w"))).as("__iv"))
    val wArr = words(col("text"))
    // docs with no strip interval keep their text untouched (left join
    // miss) — the UDF runs only where something is actually stripped
    val outCols = docs.columns.map {
      case "text" => col("__s._1").as("text")
      case c => col(c)
    }
    docs.join(iv, Seq("doc_id"), "left")
      .withColumn("__s",
        when(col("__iv").isNull,
          struct(col("text").as("_1"), lit(0).as("_2")))
          .otherwise(stripWordsUdf(wArr, col("__iv"))))
      .select(outCols.toIndexedSeq :+
        col("__s._2").cast("long").as("n_words_removed"): _*)
  }

  /** Span-level decontamination — the REDACT arm of [[decontaminate]]:
    * instead of dropping a contaminated doc whole, only the words
    * covered by a benchmark-overlapping `k`-shingle are removed
    * (positions pos..pos+k−1 per overlapping occurrence, merged per
    * doc) and the doc is re-emitted with `text` rebuilt — the right
    * tool when contamination is a quoted benchmark question inside an
    * otherwise-fine document. Same hot-shingle DF cap as
    * [[contaminationReport]] (doc-frequency over the corpus side).
    *
    * Scale shape: benchmark shingles deduped + BROADCAST (eval ≪
    * train, as in contaminationReport), one broadcast join over the
    * positional corpus shingles, then the [[applyWordStrips]] shapes
    * (doc_id-keyed merge + one equi-join + narrow rebuild).
    */
  def decontaminateRedact(docs: DataFrame, bench: DataFrame, k: Int = 13,
                          maxDf: Long = DefaultMaxShingleDf): DataFrame = {
    val hot = shingles(docs, k).groupBy("s").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("s")
    val bs = shingles(bench, k).select("s").distinct()
    val strips = positionalShingles(docs, k)
      .join(broadcast(hot), Seq("s"), "left_anti")
      .join(broadcast(bs), "s")
      .select(col("doc_id"), col("pos").as("start_w"),
        (col("pos") + (k - 1)).as("end_w"))
    applyWordStrips(docs, strips)
  }

  /** 64-bit SimHash as a 16-char hex string. Bit source: the 16 hex
    * digits of md5(word) (4 bits each); each word votes ±1 per bit,
    * majority (sum > 0) sets the bit. Pure conditional aggregation —
    * one shuffle on (doc_id), partial-combined.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val hexdigits = "0123456789abcdef"
    // ONE row per word and ONE partial-aggregated shuffle: all 64 bit
    // votes (16 hex positions × 4 bits) as wide conditional sums —
    // the 16×-row explode + two-level groupBy variant shuffled 16N rows
    // (round-2 plan-shape fix; same trick as the minhash signatures)
    val wordRows = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .select(col("doc_id"), md5(col("w").cast("binary")).as("hh"))
      // nibbles projected ONCE per row — the 64 vote sums below would
      // otherwise each re-evaluate conv(substr(...)) (4× per position)
      .select(col("doc_id") +:
        (1 to 16).map(p => conv(col("hh").substr(p, 1), 16, 10).cast("int").as(s"n$p")): _*)
    val votes = for (p <- 1 to 16; mask <- Seq(8, 4, 2, 1)) yield
      sum(when(col(s"n$p").bitwiseAND(lit(mask)) > 0, lit(1)).otherwise(lit(-1)))
        .as(s"s_${p}_$mask")
    val agged = wordRows.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val chars = (1 to 16).map { p =>
      val v = Seq(8, 4, 2, 1).map(m =>
        when(col(s"s_${p}_$m") > 0, lit(m)).otherwise(lit(0))).reduce(_ + _)
      lit(hexdigits).substr(v + 1, lit(1))
    }
    agged.select(col("doc_id"), concat(chars: _*).as("simhash64"))
  }

  /** SimHash near-duplicate pairs (round-2: the verdict flagged simhash
    * as "a fingerprint, not yet a dedup"). Banding by pigeonhole: the
    * 64-bit signature splits into 4 bands of 16 bits (4 hex chars); any
    * pair within Hamming distance ≤ 3 shares at least one full band, so
    * band equality is a complete candidate generator for maxHamming ≤ 3.
    * Candidates (equi-join on the band value — the scale path) are then
    * refined with the exact nibble-XOR popcount distance.
    */
  /** Band document-frequency cap: a band value shared by more than this
    * many docs generates ≥ df²/2 candidate pairs (common-word bit bias
    * makes some 16-bit bands genuinely hot); capped bands are dropped
    * from candidate generation, like the shingle DF cap. No-op at test
    * scale, engages at corpus scale.
    */
  val DefaultMaxBandDf = 10000L

  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   maxBandDf: Long = DefaultMaxBandDf): DataFrame =
    hamming64Pairs(simhash(docs), "doc_id", "simhash64", maxHamming, maxBandDf)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))

  /** Generic banded near-dup pairing for ANY 16-hex-char (64-bit)
    * signature relation `(idCol, hashCol)` — the machinery behind
    * [[simhashPairs]] (text) and [[MediaOps.aHashPairs]] (image):
    * 4-band pigeonhole candidate generation (complete for Hamming ≤ 3)
    * refined with the exact integer XOR popcount. Returns
    * `(id_a, id_b, hamming)` with `id_a < id_b`.
    */
  private[ops] def hamming64Pairs(sig0: DataFrame, idCol: String, hashCol: String,
                                  maxHamming: Int, maxBandDf: Long): DataFrame = {
    require(maxHamming <= 3,
      "4-band pigeonhole is complete only for maxHamming <= 3; add bands for more")
    // integer signature halves: the Hamming refine is then 2 XOR
    // popcounts per pair instead of 16 hex-char extractions (round-2
    // plan fix — band collisions make the candidate set large, so the
    // per-pair refine cost is what matters)
    val sig = sig0
      .select(col(idCol).as("__id"), col(hashCol).as("__h"),
        conv(substring(col(hashCol), 1, 8), 16, 10).cast("long").as("hi"),
        conv(substring(col(hashCol), 9, 8), 16, 10).cast("long").as("lo"))
      .cache()
    val bandStructs = (0 until 4).map(b =>
      struct(lit(b).as("b"), substring(col("__h"), b * 4 + 1, 4).as("key")))
    // ONE explicit exchange on the band key for the whole banding
    // phase: the hot-key aggregate AND both sides of the candidate
    // self-join reuse it, and — the load-bearing part — the explicit
    // partition count keeps AQE from coalescing the join's input by
    // BYTE size. Band rows are tiny (~50 B) but the join's cost is
    // CPU (candidate fan-out × popcount refine), so the 64 MB
    // advisory would funnel a million-signature corpus into a handful
    // of tasks and flatten 8→32-core scaling (measured: video-pairs
    // banding ~6 s at 32c both before and after adding cores).
    val nPart = sig0.sparkSession.sessionState.conf.numShufflePartitions
    val bands = sig
      .select(col("__id"), col("hi"), col("lo"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("__id"), col("hi"), col("lo"),
        col("bk.b").as("b"), col("bk.key").as("key"))
      .repartition(nPart, col("b"), col("key"))
    // hot-band anti-join (not a keep-join): same inversion as
    // cappedShingles — the hot set is tiny, broadcast it
    val hot = bands.groupBy("b", "key").agg(count(lit(1)).as("df"))
      .where(col("df") > maxBandDf).select("b", "key")
    val capped = bands.join(broadcast(hot), Seq("b", "key"), "left_anti")
    val cand = capped.as("x")
      .join(capped.as("y"),
        col("x.b") === col("y.b") && col("x.key") === col("y.key") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("x.hi").as("hi_a"), col("x.lo").as("lo_a"),
        col("y.__id").as("id_b"), col("y.hi").as("hi_b"), col("y.lo").as("lo_b"))
    val hamming = bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
      bit_count(col("lo_a").bitwiseXOR(col("lo_b")))
    // refine BEFORE dedup: the popcount filter is 2 codegen'd XORs per
    // candidate, the distinct is a shuffle — once band collisions make
    // candidates ≫ true pairs (n ≫ 2^16 signatures), filtering first
    // shrinks the distinct's input from every collision row (6 cols) to
    // the matched pairs only (3 cols). A pair's hamming is a function
    // of the pair, so distinct-after-filter returns the same set.
    cand.withColumn("hamming", hamming.cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .distinct()
  }

  /** BPE-ish subword segmentation regex: letter runs, digit runs, and
    * single non-alphanumeric marks — the pre-tokenization split most BPE
    * vocabularies apply before merges (kept ASCII-simple so the Spark
    * (Java) and DuckDB (RE2) engines agree exactly).
    */
  val BpeTokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Token statistics per document: whitespace tokens + BPE-ish regex
    * token count.
    */
  def tokenStats(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    docs.select(
      col("doc_id"),
      size(w).cast("long").as("n_tokens"),
      size(array_distinct(w)).cast("long").as("n_uniq_tokens"),
      length(col("text")).cast("long").as("len_chars"),
      aggregate(transform(w, t => length(t).cast("long")), lit(0L), (a, x) => a + x)
        .as("sum_token_len"),
      regexp_count(col("text"), lit(BpeTokenRegex)).cast("long").as("n_bpe_tokens"))
  }

  /** Language-ID by marker-token counts (n-gram/stopword heuristic).
    * Deterministic argmax with tie-break on language code order.
    */
  def langId(docs: DataFrame): DataFrame = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("der", "die", "und", "das"),
      "en" -> Seq("the", "a", "and", "of"),
      "es" -> Seq("el", "los", "las", "una"),
      "fr" -> Seq("le", "les", "et", "une"))
    val w = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
    val counts = markers.map { case (lang, ms) =>
      sum(when(col("w").isInCollection(ms), 1L).otherwise(0L)).as(s"c_$lang")
    }
    val agged = w.groupBy("doc_id").agg(counts.head, counts.tail: _*)
    // argmax with ties broken by language-code ascending: strictly-greater
    // comparison scanning in order de, en, es, fr
    val best = markers.map(_._1).foldLeft((lit("und"), lit(0L))) {
      case ((bl, bc), lang) =>
        val c = col(s"c_$lang")
        (when(c > bc, lit(lang)).otherwise(bl), when(c > bc, c).otherwise(bc))
    }
    agged.select((col("doc_id") +: markers.map(m => col(s"c_${m._1}"))) :+
      best._1.as("pred_lang"): _*)
  }

  /** Content-defined fingerprint: min over word 5-shingles of the shingle
    * md5 (winnowing-style min-sampling; deterministic, portable).
    */
  def fingerprint(docs: DataFrame, k: Int = 5): DataFrame =
    shingles(docs, k)
      .groupBy("doc_id")
      .agg(min(md5(col("s").cast("binary"))).as("fp"), count(lit(1)).as("n_shingles"))

  /** Lake-resident dedup fingerprint snapshot: one row per doc with the
    * exact-content md5 and the full MinHash signature (same hash family
    * as [[minhashSignatures]], as an `array<string>` of `numHashes`
    * 8-hex-char values). This is the table a continuously-ingesting
    * pipeline keeps per corpus snapshot so every new batch can be
    * deduped against the existing corpus ([[dedupIncremental]]) without
    * re-reading its text: ~100 B/doc vs ~10 KB/doc — the snapshot of a
    * 10^12-doc corpus is ~1% of the corpus bytes, and in steady state
    * it is APPENDED per ingest batch (fingerprint the batch, union),
    * never recomputed. Docs with fewer than `k` words — or whose every
    * shingle was DF-capped — get an EMPTY signature and participate in
    * exact matching only (a doc with no admissible shingles has no
    * similarity evidence either way).
    *
    * Scale shape: the shingle→minhash chain is one partial-aggregated
    * pass ([[minhashWide]]); stitching the signature onto the md5 row
    * is one equi-join on doc_id (AQE-broadcast when a batch is small;
    * at snapshot-build scale both sides co-shuffle on doc_id once).
    */
  def corpusFingerprints(docs: DataFrame, k: Int = 3, numHashes: Int = 8,
                         maxDf: Long = DefaultMaxShingleDf): DataFrame = {
    val sigs = minhashWide(cappedShingles(docs, k, maxDf), numHashes)
      .select(col("doc_id"),
        array((0 until numHashes).map(h => col(s"m$h")): _*).as("sig"))
    docs.select(col("doc_id"), md5(col("text").cast("binary")).as("exact_md5"))
      .join(sigs, Seq("doc_id"), "left")
      .withColumn("sig", coalesce(col("sig"), array().cast("array<string>")))
  }

  /** Incremental (batch-vs-corpus) dedup: classify each NEW doc against
    * a lake-resident [[corpusFingerprints]] snapshot as `exact`
    * (identical text exists in the corpus), `near` (shares a full LSH
    * band with a corpus doc AND the signature-estimated Jaccard — the
    * fraction of agreeing minhash positions — clears `minEstJaccard`),
    * or `new`. Returns `(doc_id, verdict, match_id, est_jaccard)` with
    * `match_id` the matched corpus doc (exact: minimum matching id;
    * near: highest estimate, ties to the minimum id) and `est_jaccard`
    * 1.0 for exact matches. This is the daily-delta modality: a real
    * pipeline dedups each ingest batch against 10^12 existing docs and
    * CANNOT re-cluster the corpus per batch — here the corpus
    * contributes only its fingerprint scan.
    *
    * Unlike [[minhashLshPairs]] there is no exact-Jaccard refine: the
    * corpus text is by design not available, so the similarity verdict
    * is the signature estimate (that is the accuracy/IO trade the
    * fingerprint table buys; raise `numHashes` at snapshot-build time
    * for a tighter estimate). The DF cap is computed per relation —
    * the batch's own caps for the batch, the snapshot's caps as frozen
    * at snapshot build — so fingerprinting is append-only.
    *
    * Scale shape (`broadcastNew = true`, the delta ≪ corpus contract):
    * the new batch's fingerprints broadcast to BOTH probe joins (exact
    * md5 equi-join, banded sig equi-join), so the snapshot relation
    * streams through map-side joins — zero shuffle of the 10^12-row
    * side; everything after the probes is bounded by matches, not by
    * corpus size. With `broadcastNew = false` both joins fall back to
    * AQE-planned shuffles for delta batches past the broadcast ceiling.
    */
  def dedupIncremental(newDocs: DataFrame, prints: DataFrame, k: Int = 3,
                       numHashes: Int = 8, rowsPerBand: Int = 2,
                       minEstJaccard: Double = 0.5,
                       maxDf: Long = DefaultMaxShingleDf,
                       broadcastNew: Boolean = true): DataFrame = {
    require(minEstJaccard > 0.0 && minEstJaccard <= 1.0,
      s"dedupIncremental: minEstJaccard must be in (0, 1], got $minEstJaccard")
    val nf = corpusFingerprints(newDocs, k, numHashes, maxDf).cache()
    def maybeB(df: DataFrame): DataFrame = if (broadcastNew) broadcast(df) else df
    // exact: md5 probe; min matching corpus id, deterministic
    val exact = maybeB(nf).as("n")
      .join(prints.as("p"), col("n.exact_md5") === col("p.exact_md5"))
      .groupBy(col("n.doc_id").as("doc_id"))
      .agg(min(col("p.doc_id")).as("ex_id"))
    // near: same banding as minhashLshPairs (ceil-divide; a trailing
    // partial band participates), but against the SNAPSHOT bands
    val nBands = (numHashes + rowsPerBand - 1) / rowsPerBand
    def bandsOf(fp: DataFrame): DataFrame = {
      val bandStructs = (0 until nBands).map { b =>
        struct(lit(b).as("b"),
          concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
            .as("bsig"))
      }
      fp.where(size(col("sig")) === numHashes)
        .select(col("doc_id"), col("sig"),
          explode(array(bandStructs: _*)).as("bs"))
        .select(col("doc_id"), col("sig"),
          col("bs.b").as("b"), col("bs.bsig").as("bsig"))
    }
    val est = (size(filter(zip_with(col("n.sig"), col("p.sig"),
        (a, b) => a === b), x => x)).cast("double") / numHashes)
      .as("est_jaccard")
    val near = maybeB(bandsOf(nf)).as("n")
      .join(bandsOf(prints).as("p"),
        col("n.b") === col("p.b") && col("n.bsig") === col("p.bsig"))
      .select(col("n.doc_id").as("doc_id"), col("p.doc_id").as("match_id"), est)
      .where(col("est_jaccard") >= minEstJaccard)
      .distinct()
    val bestNear = near
      .withColumn("__r", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("est_jaccard").desc, col("match_id").asc)))
      .where(col("__r") === 1)
      .select(col("doc_id"), col("match_id").as("nr_id"),
        col("est_jaccard").as("nr_est"))
    newDocs.select("doc_id")
      .join(maybeB(exact), Seq("doc_id"), "left")
      .join(maybeB(bestNear), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ex_id").isNotNull, lit("exact"))
          .when(col("nr_id").isNotNull, lit("near"))
          .otherwise(lit("new")).as("verdict"),
        when(col("ex_id").isNotNull, col("ex_id"))
          .otherwise(col("nr_id")).as("match_id"),
        when(col("ex_id").isNotNull, lit(1.0))
          .otherwise(col("nr_est")).as("est_jaccard"))
  }

  /** Near-dup PAIR GENERATORS for [[cleanCorpus]] — each maps the
    * surviving `(doc_id, text, …)` relation to `(doc_a, doc_b)` pairs
    * and feeds the same CC keep-one tail (round-4 verdict #6). The
    * minhash source is the default; simhash trades the shingle pipeline
    * for the 64-bit fingerprint band join; the embedding source dedups
    * on semantic vectors (joined on doc_id) instead of surface text.
    */
  def minhashPairSource(k: Int = 3, numHashes: Int = 8, bandSize: Int = 2,
                        threshold: Double = 0.5): DataFrame => DataFrame =
    docs => minhashLshPairs(docs, k, numHashes, bandSize, threshold)

  def simhashPairSource(maxHamming: Int = 3): DataFrame => DataFrame =
    docs => simhashPairs(docs, maxHamming)

  /** PRECOMPUTED near-dup pairs as a cleanCorpus source (round-5 verdict
    * #4): a real pipeline materializes its pair table on the lake once
    * and reuses it across compositions — regenerating the minhash
    * pipeline inside every job made the driver's `dedup_clusters*` /
    * `pipeline_clean_spans` walls ~80–90% pair recompute. `pairs` is any
    * `(doc_a, doc_b, …)` relation (the shape every pair operator here
    * emits and `dedup_cc_only` benches). Pairs are restricted to docs
    * that SURVIVED the upstream stages (left-semi on both endpoints), so
    * a stale lake pair over a quality- or exact-dropped doc cannot
    * resurrect it into a cluster.
    */
  def precomputedPairSource(pairs: DataFrame): DataFrame => DataFrame =
    docs => {
      val ids = docs.select(col("doc_id"))
      pairs
        .join(ids.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_semi")
        .join(ids.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_semi")
    }

  /** embedding-cosine near-dup pairs as a cleanCorpus source: `embs` is
    * the `(vec_id, embedding)` relation keyed by doc_id; only vectors of
    * SURVIVING docs participate (left-semi on the stage input, so the
    * quality/exact drops propagate into candidate generation).
    */
  def embeddingPairSource(embs: DataFrame, minCos: Double = 0.95,
                          nBits: Int = 8, dim: Int = 64): DataFrame => DataFrame =
    docs => VectorOps.cosineNearDupPairs(
        embs.join(docs.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
        minCos, nBits, dim)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))

  /** SemDeDup-style semantic near-dup pairs as a cleanCorpus source
    * ([[VectorOps.semanticNearDupPairs]] — centroid-cluster candidates,
    * exact cosine refine): the paraphrase-level dedup arm the sign-LSH
    * [[embeddingPairSource]] cannot reach (recall note there). Same
    * survivor left-semi contract as every pair source.
    */
  def semanticPairSource(embs: DataFrame, centroids: Array[Array[Double]],
                         minCos: Double = 0.8): DataFrame => DataFrame =
    docs => VectorOps.semanticNearDupPairs(
        embs.join(docs.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
        centroids, minCos)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))

  /** End-to-end corpus cleaning — the composition a training-data
    * pipeline actually runs, as one operator: quality filter (length +
    * distinct-token floor) → exact dedup (keep the min doc_id per
    * identical text) → near-dup dedup (keep the min doc_id per
    * connected component of `pairSource` pairs). Returns the surviving
    * doc ids. For per-stage drop accounting use [[cleanCorpusStaged]].
    *
    * Scale shape: a narrow filter pushed to the scan, one hash agg, the
    * pair pipeline (its own 100 TB shapes documented at
    * [[minhashLshPairs]] / [[simhashPairs]] /
    * [[VectorOps.cosineNearDupPairs]]), the CC iteration over pairs
    * only, and a final equi-join against the (small — only docs that
    * were IN a pair) cluster map. The filtered survivor set is consumed
    * twice (pair pipeline + final join), so it is cached; callers
    * release via `spark.catalog.clearCache()` per the class
    * cache-lifecycle note.
    */
  def cleanCorpus(docs: DataFrame, minChars: Long = 50, minUniqTokens: Long = 10,
                  pairSource: DataFrame => DataFrame = minhashPairSource()): DataFrame =
    cleanCorpusPlan(docs, minChars, minUniqTokens, pairSource, cacheStages = false)._3

  /** back-compat signature with explicit minhash parameters */
  def cleanCorpus(docs: DataFrame, minChars: Long, minUniqTokens: Long,
                  k: Int, numHashes: Int, bandSize: Int,
                  threshold: Double): DataFrame =
    cleanCorpus(docs, minChars, minUniqTokens,
      minhashPairSource(k, numHashes, bandSize, threshold))

  /** [[cleanCorpus]] with the KEEP-LONGEST representative policy: per
    * near-dup cluster, the surviving doc is the one with the longest
    * text (most chars — a length-as-quality proxy many production
    * pipelines prefer over arbitrary-id selection: near-dups often
    * differ by truncation, and min-id would happily keep the truncated
    * copy), ties broken by lowest doc_id so the choice stays
    * deterministic. Quality filter and exact-dedup stages are identical
    * to [[cleanCorpus]]; only the cluster-representative rule changes.
    *
    * Scale shape: everything [[cleanCorpus]] pays, plus one window
    * keyed by cluster id over the (survivor-sized) labeled relation —
    * cluster sizes are near-dup family sizes, so no skew beyond what
    * the CC labels already carry.
    */
  def cleanCorpusKeepLongest(docs: DataFrame, minChars: Long = 50,
                             minUniqTokens: Long = 10,
                             pairSource: DataFrame => DataFrame = minhashPairSource())
      : DataFrame =
    cleanCorpusPlan(docs, minChars, minUniqTokens, pairSource,
      cacheStages = false, keepPolicy = "longest")._3

  /** [[cleanCorpus]] plus the per-stage drop accounting a production
    * pipeline needs for observability (round-4 verdict #6): returns
    * (survivor doc ids, stats) where stats has one row per stage —
    * `(stage, n_in, n_kept, n_dropped)` for `quality`, `exact_dedup`,
    * `near_dup` — and n_kept of each stage equals n_in of the next.
    * Materializes the pipeline (the counts are actions); the survivors
    * DataFrame reuses the cached stages, not a recompute.
    */
  def cleanCorpusStaged(docs: DataFrame, minChars: Long = 50, minUniqTokens: Long = 10,
                        pairSource: DataFrame => DataFrame = minhashPairSource())
      : (DataFrame, DataFrame) = {
    // cacheStages: the per-stage counts would otherwise rescan the
    // corpus once per count PLUS once per consumer of the uncached
    // quality filter (~4-5 full passes, round-5 review finding); with q
    // cached the whole accounting costs ~2 corpus scans (nIn + the
    // cache materialization) and everything downstream reads the cache
    val (q, exq, survivors) =
      cleanCorpusPlan(docs, minChars, minUniqTokens, pairSource, cacheStages = true)
    val spark = docs.sparkSession
    import spark.implicits._
    val nIn = docs.count()
    val nQ = q.count()
    val nEx = exq.count()
    val surv = survivors.cache()
    val nFinal = surv.count()
    val stats = Seq(
      ("quality", nIn, nQ, nIn - nQ),
      ("exact_dedup", nQ, nEx, nQ - nEx),
      ("near_dup", nEx, nFinal, nEx - nFinal))
      .toDF("stage", "n_in", "n_kept", "n_dropped")
    (surv, stats)
  }

  /** The quality-filter → exact-dedup prefix shared by every clean-
    * pipeline form: returns (q, exq-uncached). Factored out so
    * [[cleanCorpusPairs]] derives its stage-1 artifact from the
    * IDENTICAL relation the in-query composition dedups — any drift
    * between the two would silently change which pairs exist.
    */
  private def qualityExactStage(docs: DataFrame, minChars: Long,
                                minUniqTokens: Long, cacheQ: Boolean)
      : (DataFrame, DataFrame) = {
    val q0 = docs.where(length(col("text")) >= minChars &&
      size(array_distinct(words(col("text")))) >= minUniqTokens)
    // staged (observability) calls cache the quality filter — its count
    // plus both exq consumers then share one materialization; the
    // default path stays cache-free (exq is the only relation
    // consumed by multiple branches there)
    val q = if (cacheQ) q0.cache() else q0
    val exKeep = q.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .drop("h")
    (q, q.join(exKeep, "doc_id"))
  }

  /** Stage-1 LAKE ARTIFACT of the clean pipeline (round-7 verdict #4):
    * the near-dup pair table over the quality+exact survivors — the
    * relation a production pipeline materializes ONCE per corpus
    * snapshot and feeds to every downstream composition via
    * [[precomputedPairSource]], instead of re-running the pair pipeline
    * (80–90% of [[cleanCorpus]]'s wall) inside each job. Built over the
    * same `(minChars, minUniqTokens)` prefix [[cleanCorpus]] applies,
    * so the precomputed path is pair-for-pair identical to the
    * in-query default (the DF caps inside the pair pipeline are
    * corpus-relative — computing pairs over a DIFFERENT relation, e.g.
    * the raw corpus, would NOT be: see [[cappedShingles]]).
    *
    * Scale shape: exactly one run of the pair pipeline; the artifact is
    * matches-proportional (pairs, not docs). Version it with the corpus
    * snapshot it was built from, like any derived lake table.
    */
  def cleanCorpusPairs(docs: DataFrame, minChars: Long = 50,
                       minUniqTokens: Long = 10,
                       pairSource: DataFrame => DataFrame = minhashPairSource())
      : DataFrame =
    pairSource(qualityExactStage(docs, minChars, minUniqTokens, cacheQ = false)._2)

  private def cleanCorpusPlan(docs: DataFrame, minChars: Long, minUniqTokens: Long,
                              pairSource: DataFrame => DataFrame,
                              cacheStages: Boolean,
                              keepPolicy: String = "min_id")
      : (DataFrame, DataFrame, DataFrame) = {
    val (q, exq0) = qualityExactStage(docs, minChars, minUniqTokens, cacheStages)
    val exq = exq0.cache()
    val clusters = nearDupClusters(pairSource(exq))
    val survivors = keepPolicy match {
      case "min_id" =>
        exq.select("doc_id")
          .join(clusters, Seq("doc_id"), "left")
          .where(col("keep_id").isNull || col("keep_id") === col("doc_id"))
          .select("doc_id")
      case "longest" =>
        // cluster membership for every exact-dedup survivor (singletons
        // — docs in no pair — own their cluster via the coalesce), then
        // one window picks the longest text per cluster, ties to the
        // lowest doc_id
        val labeled = exq
          .select(col("doc_id"), length(col("text")).cast("long").as("__len"))
          .join(clusters, Seq("doc_id"), "left")
          .withColumn("__c", coalesce(col("keep_id"), col("doc_id")))
        val w = Window.partitionBy(col("__c"))
          .orderBy(col("__len").desc, col("doc_id").asc)
        labeled.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1)
          .select("doc_id")
      case other =>
        throw new IllegalArgumentException(
          s"cleanCorpusPlan: unknown keepPolicy '$other' (min_id | longest)")
    }
    (q, exq, survivors)
  }

  /** Benchmark DECONTAMINATION report — the train/eval overlap check a
    * training-data pipeline runs before any model sees the corpus: for
    * every training doc sharing at least one word `k`-shingle with any
    * benchmark doc, emit (doc_id, n_hits = number of DISTINCT
    * overlapping shingles, bench_id = lowest matching benchmark doc).
    * Production uses long shingles (the customary 13-grams — default);
    * the driver query runs k=3 against the short synthetic docs.
    *
    * Scale shape: benchmark shingles are deduped to one row per shingle
    * (min bench id) and BROADCAST — eval sets are tiny next to a
    * training corpus by construction — so the corpus shingle stream
    * pays one broadcast-hash join + a partial-aggregated per-doc count;
    * no shuffle of the corpus side, never all-pairs. The corpus-side
    * hot-shingle DF cap stays on as the usual skew guard (a stop-phrase
    * shingle carries no contamination signal at k=13 and would only
    * fan out the join).
    */
  def contaminationReport(docs: DataFrame, bench: DataFrame, k: Int = 13,
                          maxDf: Long = DefaultMaxShingleDf): DataFrame = {
    // one row per DISTINCT benchmark shingle: the per-shingle min bench
    // id makes the post-join per-doc min(bench_id) the global minimum
    // over all matches, and guarantees each matching corpus shingle
    // joins exactly once (count(*) == distinct overlapping shingles)
    val bs = shingles(bench, k)
      .groupBy("s").agg(min("doc_id").as("bench_id"))
    cappedShingles(docs, k, maxDf)
      .join(broadcast(bs), "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), min("bench_id").as("bench_id"))
  }

  /** [[contaminationReport]]'s enforcement arm: the corpus with every
    * doc overlapping ≥ `minHits` benchmark shingles REMOVED (broadcast
    * anti-join against the small contaminated-id set). `minHits` is the
    * MINIMUM hit count that triggers removal (round-5 ADVICE: the old
    * name `maxHits` read as "tolerated hits" while the predicate removed
    * at ≥, so `maxHits = 3` deleted docs with exactly 3 hits).
    */
  def decontaminate(docs: DataFrame, bench: DataFrame, k: Int = 13,
                    minHits: Long = 1,
                    maxDf: Long = DefaultMaxShingleDf): DataFrame =
    docs.join(
      broadcast(contaminationReport(docs, bench, k, maxDf)
        .where(col("n_hits") >= minHits).select("doc_id")),
      Seq("doc_id"), "left_anti")

  /** REPETITION quality signals (the Gopher/Dolma-style rules a
    * training-data filter thresholds on): per doc, the total and
    * most-frequent-occurrence counts for words and word bigrams —
    * `top_word_n / n_words` and `top_bigram_n / n_bigrams` are the
    * repetition fractions; boilerplate and degenerate generations score
    * high. Integer outputs so the oracle is exact; ties need no
    * breaking (only the max COUNT is reported, not the term).
    *
    * Scale shape: one explode + two partial-aggregated shuffles keyed
    * by (doc_id, term) then doc_id — no content-wide keys, so no
    * hot-term skew (a stop word is frequent WITHIN docs, but the
    * aggregation key includes doc_id).
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val w = docs.select(col("doc_id"), words(col("text")).as("w"))
    val wordTop = w
      .select(col("doc_id"), explode(col("w")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_words"), max("n").as("top_word_n"))
    val bigramTop = w
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("w")) - 1),
        i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
        .as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"), max("n").as("top_bigram_n"))
    // left join: a 1-word doc has words but no bigrams (0-count rows,
    // not dropped rows)
    wordTop.join(bigramTop, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("top_word_n"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"))
  }

  /** Text quality scoring: integer-valued features a filtering pipeline
    * thresholds on (all exact → oracle-checkable).
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val stop = Seq("the", "a", "and", "of", "to", "in")
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("len_chars"),
      size(w).cast("long").as("n_tokens"),
      aggregate(transform(w, t => when(t.isInCollection(stop), 1L).otherwise(0L)),
        lit(0L), (a, x) => a + x).as("n_stopwords"),
      length(regexp_replace(col("text"), "[^ ]", "")).cast("long").as("n_spaces"),
      size(array_distinct(w)).cast("long").as("n_uniq_tokens"))
  }

  /** EXACT top-fraction selection by score — "keep the top 30% of docs
    * by quality score", the selection step after [[qualityScore]]-style
    * models, with the ordering made total by the doc_id tiebreak so the
    * kept set is unique and oracle-checkable.
    *
    * The naive form (`row_number().over(Window.orderBy(...))` with no
    * partition key) funnels the ENTIRE relation through one partition —
    * the classic global-sort antipattern. This is the scale-safe exact
    * equivalent: range-repartition on the sort key (each partition owns
    * a contiguous score range), count rows per partition (a #partitions-
    * sized driver collect), broadcast the prefix offsets back as a
    * literal map, and compute global rank = partition offset + local
    * row_number — every step parallel, no single-partition stage.
    *
    * The ranged relation is CACHED inside the operator: the range
    * exchange's sampled boundaries can differ between independent jobs,
    * and the partition counts and the rank pass must see the SAME
    * physical partitioning (the cache pins it; the count that sizes `k`
    * doubles as the materializing action). Callers release via
    * `spark.catalog.clearCache()` per the class cache-lifecycle note.
    *
    * Returns the kept rows with `score` and `global_rank` (1-based)
    * appended. Output is deterministic under any input partitioning:
    * (score, doc_id) is a total order, so rank — and therefore the kept
    * set — does not depend on where the range boundaries land.
    */
  def selectTopFraction(docs: DataFrame, score: Column, frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0,
      s"selectTopFraction: frac must be in (0, 1], got $frac")
    val spark = docs.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val ranged = docs
      .withColumn("score", score.cast("long"))
      .repartitionByRange(parts, col("score").desc, col("doc_id").asc)
      .withColumn("__pid", spark_partition_id())
      .cache()
    val counts = ranged.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val k = math.ceil(frac * n).toLong
    val offsets: Map[Int, Long] = counts.keys.toSeq.sorted
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), pid) =>
        (pid, acc + counts(pid))
      }
      .sliding(2).collect { case Seq((_, acc), (pid, _)) => pid -> acc }.toMap
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("score").desc, col("doc_id").asc)
    ranged
      .withColumn("global_rank",
        row_number().over(w).cast("long") +
          element_at(typedLit(offsets), col("__pid")))
      .where(col("global_rank") <= k)
      .drop("__pid")
  }

  /** [[selectTopFraction]] without the rank column — the common "keep
    * the top 30%" form, exact, at a fraction of the shuffle. Ranks
    * force the full rows through one exchange (every row must meet its
    * ordered neighbors); the kept SET only needs the k-th largest
    * `(score, doc_id)` pair — a single cutoff value — so this path:
    * range-partitions only the narrow `(doc_id, score)` projection,
    * finds the partition holding global rank k from the per-partition
    * counts (driver sees #partitions longs), sorts ONLY that partition
    * to read the cutoff pair, then filters the original relation with a
    * lexicographic comparison against the broadcast-free literal
    * cutoff. The corpus is scanned twice but its full rows are never
    * shuffled — at 100 TB a second parquet scan is cheap, a 100 TB
    * exchange is not. Output = input rows (+ `score`), exactly the
    * [[selectTopFraction]] kept set (spec-pinned equality).
    */
  def selectTopFractionFilter(docs: DataFrame, score: Column, frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0,
      s"selectTopFractionFilter: frac must be in (0, 1], got $frac")
    val spark = docs.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    // the narrow projection is cached BEFORE range partitioning: the
    // range sampler's boundary pass would otherwise be a third full
    // scan of the input (score is recomputed per pass on a computed
    // relation) — cached, both the sampler and the exchange read ~16
    // bytes/row. The ranged relation is cached too so the count pass
    // and the cutoff pass see one physical partitioning (not a
    // recompute that merely happens to re-sample the same boundaries).
    val narrow = docs
      .select(col("doc_id"), score.cast("long").as("score")).cache()
    val ranged = narrow
      .repartitionByRange(parts, col("score").desc, col("doc_id").asc)
      .withColumn("__pid", spark_partition_id())
      .cache()
    val counts = ranged.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val scored = docs.withColumn("score", score.cast("long"))
    if (n == 0) {
      // unpersist BEFORE the early return — the empty-input path must
      // not leak the two cached relations for the session (round-6
      // ADVICE)
      ranged.unpersist(false)
      narrow.unpersist(false)
      return scored.where(lit(false))
    }
    val k = math.ceil(frac * n).toLong
    // partition owning global rank k, and the ranks before it
    var acc = 0L; var cutPid = -1
    for (pid <- counts.keys.toSeq.sorted if cutPid < 0) {
      if (acc + counts(pid) >= k) cutPid = pid else acc += counts(pid)
    }
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val cut = ranged.where(col("__pid") === cutPid)
      .withColumn("__r", row_number().over(w))
      .where(col("__r") === k - acc)
      .select("score", "doc_id").collect().head
    ranged.unpersist(false)
    narrow.unpersist(false)
    val (cs, cd) = (cut.getLong(0), cut.getLong(1))
    scored.where(col("score") > cs ||
      (col("score") === cs && col("doc_id") <= cd))
  }

  /** One full ingest round over a fingerprint snapshot: classify the
    * batch with [[dedupIncremental]], then append the fingerprints of
    * the docs that SURVIVED (verdict `new`, plus `near` when
    * `admitNear`) to the snapshot. Returns `(verdicts, updatedPrints)`
    * — the updated snapshot is what the next batch dedups against, so
    * successive batches are deduped against earlier batches' survivors
    * as well as the original corpus, without any corpus recompute:
    * the snapshot only ever APPENDS batch-sized increments (in
    * production: write the increment to the lake table; the union here
    * is the same relation). Exact dups and (when `admitNear` is false)
    * near dups are NOT fingerprinted — admitting a duplicate's
    * fingerprint would make it a future match target and shadow the
    * canonical doc.
    */
  def ingestBatch(newDocs: DataFrame, prints: DataFrame, k: Int = 3,
                  numHashes: Int = 8, rowsPerBand: Int = 2,
                  minEstJaccard: Double = 0.5,
                  maxDf: Long = DefaultMaxShingleDf,
                  broadcastNew: Boolean = true,
                  admitNear: Boolean = false): (DataFrame, DataFrame) = {
    val verdicts = dedupIncremental(newDocs, prints, k, numHashes,
      rowsPerBand, minEstJaccard, maxDf, broadcastNew).cache()
    val admitted = if (admitNear) Seq("new", "near") else Seq("new")
    val survivors = newDocs.join(
      verdicts.where(col("verdict").isInCollection(admitted))
        .select("doc_id"), Seq("doc_id"), "left_semi")
    (verdicts, prints.unionByName(
      corpusFingerprints(survivors, k, numHashes, maxDf)))
  }

  /** Email pattern shared by [[redactPii]] and its oracle — plain
    * character classes + bounded quantifiers only, so Java regex
    * (Spark) and RE2 (DuckDB) agree on every match.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone pattern: optional +, then ≥8 chars of digits/space/()/- with
    * digits at both ends. Same portability contract as [[EmailPattern]].
    */
  val PhonePattern: String = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII redaction — the scrub step a training pipeline runs before
    * anything else sees the text: emails → `<EMAIL>`, then phone-shaped
    * digit runs → `<PHONE>` (emails first ON PURPOSE: a digit-bearing
    * local part must not be half-eaten by the phone pattern; phones are
    * counted on the email-redacted text for the same reason). All
    * original columns preserved with `text` replaced; `n_emails` /
    * `n_phones` appended (match counts BEFORE each replacement).
    *
    * Pattern scope is deliberately conservative (the two
    * unambiguous-by-shape PII classes); real deployments add
    * jurisdiction-specific patterns — each added pattern must keep the
    * Java/RE2 portability contract if oracle parity is wanted.
    *
    * Scale shape: a narrow per-row projection — ZERO shuffles, plan-
    * audited alongside [[sampleMix]].
    */
  def redactPii(docs: DataFrame): DataFrame = {
    val afterEmail = regexp_replace(col("text"), EmailPattern, "<EMAIL>")
    val outCols = docs.columns.map {
      case "text" => regexp_replace(afterEmail, PhonePattern, "<PHONE>").as("text")
      case c => col(c)
    }
    docs.select(outCols.toIndexedSeq :+
      size(regexp_extract_all(col("text"), lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails") :+
      size(regexp_extract_all(afterEmail, lit(PhonePattern), lit(0)))
        .cast("long").as("n_phones"): _*)
  }

  /** Size of the [[mixBucket]] hash domain: 16^6 (6 md5 hex digits). */
  val MixBucketDomain: Long = 1L << 24

  /** Deterministic uniform bucket in [0, 16^6) from the doc id and a
    * salt: the first 6 hex digits of `md5(id || ':' || salt)`. Portable
    * by construction — DuckDB computes the identical value as
    * `cast(('0x' || substr(md5(id || ':salt'), 1, 6)) as bigint)`, so
    * sampling decisions are oracle-checkable bit-for-bit (Spark's
    * `hash()`/`rand()` are engine-specific and would not be).
    */
  private[ops] def mixBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 6), 16, 10)
      .cast("long")

  /** Deterministic weighted corpus sampling / source mixing — the "data
    * mixture" step of a training pipeline (sample web at 30%, books at
    * 100%, …). Each doc draws a uniform bucket from [[mixBucket]]
    * (doc_id + salt — changing the salt redraws the whole sample) and
    * survives iff `bucket < floor(rate(source) · 16^6)`; sources absent
    * from `rates` are dropped entirely (an explicit mixture, not a
    * passthrough). Thresholding on the integer floor makes the kept set
    * exact and reproducible on any engine; the realized rate differs
    * from the request by < 16^−6.
    *
    * All original columns are preserved; `mix_bucket` is appended so
    * downstream stages (and audits) can see each doc's draw.
    *
    * Scale shape: a narrow projection + filter — ZERO shuffles, no
    * joins (the rate map rides along as a literal map column, never a
    * relation). Fully deterministic under any partitioning, so a resume
    * or re-run selects the identical sample — unlike `rand()`-based
    * sampling, which draws per-task.
    */
  def sampleMix(docs: DataFrame, rates: Map[String, Double],
                salt: String = "mix"): DataFrame = {
    require(rates.nonEmpty, "sampleMix: rates must name at least one source")
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      s"sampleMix: every rate must be in [0, 1], got $rates")
    val thresholds: Map[String, Long] =
      rates.map { case (s, r) => s -> math.floor(r * MixBucketDomain).toLong }
    val thr = element_at(typedLit(thresholds), col("source"))
    docs
      .withColumn("mix_bucket", mixBucket(col("doc_id"), salt))
      .where(thr.isNotNull && col("mix_bucket") < thr)
  }

  /** [[sampleMix]] with DATA-DEPENDENT rates — "sample each source down
    * to a token budget", the standard mixing formulation (give me ≤50 B
    * web tokens, ≤20 B books tokens, …). Per source,
    * `rate = min(1, budget / total_tokens)`; each doc then survives the
    * same portable [[mixBucket]] Bernoulli draw at
    * `threshold = floor(rate · 16^6)`. The realized token count
    * concentrates near `rate · total` (a per-doc draw cannot hit the
    * budget exactly; the expected overshoot/undershoot is one doc's
    * tokens per 16^6 of threshold granularity). Sources without a budget
    * are dropped, as in [[sampleMix]].
    *
    * Determinism is oracle-grade despite the double rate: the rate is
    * ONE IEEE division, the threshold ONE multiply + floor — every
    * engine computes the identical int64 threshold (the oracle-
    * portability rule: doubles only from single divisions).
    *
    * Scale shape: one partial-aggregated per-source token count (output
    * = #sources rows), broadcast back onto the corpus (explicit hint —
    * the relation is tiny by construction), then the narrow draw +
    * filter. Two corpus passes total — inherent to data-dependent
    * rates (the budget cannot be applied before the totals exist).
    */
  def sampleToBudget(docs: DataFrame, budgets: Map[String, Long],
                     salt: String = "mix"): DataFrame = {
    require(budgets.nonEmpty, "sampleToBudget: budgets must name at least one source")
    require(budgets.values.forall(_ >= 0L),
      s"sampleToBudget: budgets must be >= 0, got $budgets")
    val budget = element_at(typedLit(budgets), col("source"))
    val thresholds = docs
      .where(budget.isNotNull)
      .groupBy("source")
      .agg(sum(size(words(col("text"))).cast("long")).as("__total"))
      .select(col("source"),
        when(col("__total") <= budget, lit(MixBucketDomain))
          .otherwise(floor(budget.cast("double") / col("__total").cast("double")
            * MixBucketDomain.toDouble))
          .as("__thr"))
    docs
      .withColumn("mix_bucket", mixBucket(col("doc_id"), salt))
      .join(broadcast(thresholds), "source")
      .where(col("mix_bucket") < col("__thr"))
      .drop("__thr")
  }

  /** Deterministic per-key downsampling cap — "keep at most k docs per
    * DGGS cell" (geo-stratified corpus thinning against geographic
    * skew: a web corpus has 10^6× more docs over cities than oceans),
    * or per-domain / per-source caps with any key expression. The kept
    * k are a uniform random subset per key, but drawn through the
    * portable [[mixBucket]] hash (ordered by `(cap_bucket, id)` — a
    * total order since `id` is unique by caller contract), so the
    * selection is reproducible bit-for-bit on any engine and stable
    * under re-runs and resumes, unlike `rand()`-ranked sampling.
    *
    * Scale shape — the naive form (`row_number` over a window per key)
    * is one shuffle + one sort per key, which is fine until a hot key
    * arrives: the whole point of applying a cap is that SOME keys hold
    * a huge share of the corpus, and that key's full row set would
    * funnel through one task. This is the exact two-stage form: stage 1
    * windows over `(key, cap_bucket % subgroups)` — the hot key's rows
    * split across `subgroups` tasks — and keeps k per subgroup (the
    * global per-key top-k by `(cap_bucket, id)` is a subset of the
    * union of subgroup top-k's, the standard salted top-k bound);
    * stage 2 re-ranks the ≤ k·subgroups survivors per key, a relation
    * bounded per key regardless of input skew. Both stages are plain
    * shuffles on content keys; nothing touches the driver.
    *
    * Appends `cap_bucket` (the draw) and `cap_rank` (1-based rank among
    * the key's kept rows). `subgroups` trades stage-1 fan-out against
    * stage-2 size; correctness does not depend on it (spec-pinned).
    */
  def sampleCapPerKey(df: DataFrame, key: Column, id: Column, maxPerKey: Int,
                      salt: String = "cap", subgroups: Int = 16): DataFrame = {
    require(maxPerKey >= 1, s"sampleCapPerKey: maxPerKey must be >= 1, got $maxPerKey")
    require(subgroups >= 1, s"sampleCapPerKey: subgroups must be >= 1, got $subgroups")
    val drawn = df
      .withColumn("cap_bucket", mixBucket(id, salt))
      .withColumn("__cap_id", id)
      .withColumn("__cap_key", key)
    val w1 = Window
      .partitionBy(col("__cap_key"), pmod(col("cap_bucket"), lit(subgroups)))
      .orderBy(col("cap_bucket").asc, col("__cap_id").asc)
    val w2 = Window.partitionBy(col("__cap_key"))
      .orderBy(col("cap_bucket").asc, col("__cap_id").asc)
    drawn
      .withColumn("__r1", row_number().over(w1))
      .where(col("__r1") <= maxPerKey)
      .withColumn("cap_rank", row_number().over(w2).cast("long"))
      .where(col("cap_rank") <= maxPerKey)
      .drop("__r1", "__cap_id", "__cap_key")
  }

  /** GPT-style sequence packing (concatenate-and-chop): docs are
    * assigned to `nBuckets` independent token streams by
    * `doc_id % nBuckets`, concatenated within each bucket in doc_id
    * order, and the stream chopped into fixed `seqLen`-token training
    * sequences. A doc that straddles a boundary is SPLIT (the standard
    * pretraining convention — no padding waste), so the output is one
    * row per (doc, pack) segment:
    * `(bucket, doc_id, n_tokens, pack_id, seg_start_w, seg_end_w)` with
    * word offsets 1-based inclusive within the doc and `pack_id` local
    * to the bucket. Every token of every doc lands in exactly one
    * segment; `sum(seg_end_w − seg_start_w + 1) = sum(n_tokens)`.
    *
    * Scale shape: ONE shuffle (the per-bucket window: partition by
    * bucket, order by doc_id for the running token offset), then a
    * narrow explode over each doc's pack range (⌈n/seqLen⌉+1 rows max).
    * Pack ids are per-bucket, so no global sequence/coordination is
    * needed — buckets are embarrassingly parallel, and at cluster scale
    * `nBuckets` is sized ≫ executor count (each bucket's stream is
    * packed sequentially by construction: that per-bucket order IS the
    * operator's semantics, not an implementation accident). The running
    * offset is a simple prefix sum per bucket — deterministic because
    * doc_id is unique.
    *
    * `shuffleSalt`: when set, bucket assignment and within-bucket order
    * follow the portable [[mixBucket]] draw instead of doc_id — the
    * pre-packing shuffle a production pipeline runs so adjacent docs in
    * a training sequence are decorrelated; a different salt yields a
    * fresh epoch permutation, still bit-reproducible on any engine.
    */
  def packSequences(docs: DataFrame, seqLen: Int, nBuckets: Int,
                    shuffleSalt: Option[String] = None): DataFrame = {
    require(seqLen >= 1, s"packSequences: seqLen must be >= 1, got $seqLen")
    require(nBuckets >= 1, s"packSequences: nBuckets must be >= 1, got $nBuckets")
    // production pipelines SHUFFLE before packing so adjacent docs in a
    // training sequence are decorrelated: with a salt, the bucket and
    // the within-bucket order both follow the portable md5 draw (change
    // the salt → a fresh epoch permutation, still fully deterministic
    // and oracle-checkable); without, doc_id order (the stable layout)
    val (bucketCol, orderCols) = shuffleSalt match {
      case Some(salt) =>
        val draw = mixBucket(col("doc_id"), salt)
        (pmod(draw, lit(nBuckets.toLong)),
          Seq(col("__draw"), col("doc_id")))
      case None =>
        (col("doc_id") % nBuckets, Seq(col("doc_id")))
    }
    val w = Window.partitionBy(col("bucket")).orderBy(orderCols: _*)
    val L = lit(seqLen.toLong)
    docs
      .select(col("doc_id"),
        shuffleSalt.map(s => mixBucket(col("doc_id"), s))
          .getOrElse(lit(0L)).as("__draw"),
        bucketCol.as("bucket"),
        size(words(col("text"))).cast("long").as("n_tokens"))
      // running token offset of this doc within its bucket's stream
      .withColumn("stream_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // integer div via `div` (long `/` is double division in Spark and
      // would lose exactness past 2^53 stream offsets)
      .withColumn("pack_id",
        explode(sequence(expr(s"stream_off div ${seqLen}L"),
          expr(s"(stream_off + n_tokens - 1) div ${seqLen}L"))))
      .select(col("bucket"), col("doc_id"), col("n_tokens"), col("pack_id"),
        greatest(lit(1L), col("pack_id") * L - col("stream_off") + 1L)
          .as("seg_start_w"),
        least(col("n_tokens"), (col("pack_id") + 1L) * L - col("stream_off"))
          .as("seg_end_w"))
  }

  /** [[stripRepeatedSpans]] fed from a PRECOMPUTED [[repeatedSpans]]
    * table instead of recomputing the run pipeline — the lake-resident
    * shape (compute the span table once, persist it, feed both the
    * report and the enforcement arm), mirroring
    * [[precomputedPairSource]] for the pair operators.
    *
    * Equivalent to [[stripRepeatedSpans]] by the keep-the-minimum
    * convention (pinned by SparkOpsSpec on planted + corpus data): for
    * each `passage_md5`, the lowest doc_id holding that exact passage
    * keeps it; every other doc's occurrence is stripped. The pairwise
    * db-side strip set and this per-passage rule produce identical
    * MERGED interval coverage — any span this rule keeps that some
    * pair would strip is subsumed by a longer passage's strip from that
    * same pair, and vice versa (both directions ride on: two docs
    * sharing passage X produce a maximal run ⊇ X's interval).
    *
    * Scale shape: one window keyed by passage_md5 over the (small,
    * matches-proportional) span table, then [[applyWordStrips]]'s
    * doc_id-keyed merge + one equi-join + narrow rebuild — the
    * content-keyed anchor pipeline (the expensive 80–90% of the full
    * recompute, see BENCH/BASELINE.md) is skipped entirely.
    */
  def stripRepeatedSpansFromSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("passage_md5"))
    applyWordStrips(docs,
      spans
        .withColumn("__keep", min(col("doc_id")).over(w))
        .where(col("doc_id") > col("__keep"))
        .select(col("doc_id"), col("start_w"), col("end_w")))
  }

  /** CCNet/RefinedWeb-style LINE-level boilerplate removal: drop every
    * line whose exact text appears in at least `minDf` DISTINCT
    * documents (navigation bars, cookie banners, license footers — the
    * duplication modality whole-doc hashing and passage-level
    * [[repeatedSpans]] both miss: a 2-line footer stamped on a million
    * otherwise-unique pages is below every shingle threshold per doc
    * but dominates the token count of a crawled corpus).
    *
    * Semantics: a line's doc frequency counts each containing doc ONCE
    * (a footer repeated inside one doc is not corpus boilerplate by
    * itself); blank lines never count and never drop (they are document
    * structure, not content); when a line IS boilerplate, EVERY
    * occurrence of it drops, including within-doc repeats. Every input
    * row is re-emitted with `text` rebuilt (surviving lines joined by
    * \n in original order, '' when nothing survives) plus
    * `n_lines_removed`. Line identity is exact text — callers wanting
    * case-/whitespace-insensitive matching normalize `text` first.
    *
    * Scale shape: doc frequency is one `array_distinct` explode + ONE
    * partial-aggregated groupBy(line); the boilerplate relation
    * (df ≥ minDf) is tiny relative to the line universe and BROADCAST
    * to the position join by default (`broadcastBoiler = false` is the
    * past-the-ceiling fallback: shuffle-hash on the line key). Drop
    * POSITIONS (affected docs only) merge back via ONE doc_id equi-join
    * + a narrow higher-order filter. The op scans the corpus relation
    * three times (df pass, position pass, rebuild pass) — feed it a
    * lake table, not an expensive unmaterialized plan. Every exchange
    * carries an explicit partition count (AQE's byte advisory would
    * coalesce the small-row CPU-bound stages — the CC-loop/banding
    * discipline).
    */
  def dedupLines(docs: DataFrame, minDf: Long = 10,
                 broadcastBoiler: Boolean = true): DataFrame = {
    require(minDf >= 2,
      s"minDf must be >= 2, got $minDf (1 would drop every non-empty line)")
    dedupLinesFromBoiler(docs, boilerplateLines(docs, minDf), broadcastBoiler)
  }

  /** The doc-frequency half of [[dedupLines]]: the `(line)` relation of
    * corpus boilerplate (exact lines in ≥ minDf distinct docs) — compute
    * once per corpus snapshot, persist it, and feed
    * [[dedupLinesFromBoiler]] (the lake shape, mirroring
    * [[precomputedPairSource]] / [[corpusFingerprints]]).
    */
  def boilerplateLines(docs: DataFrame, minDf: Long = 10): DataFrame =
    // BARE groupBy on purpose — all three forms were measured (4M docs,
    // 10 lines/doc, 2 hot classes):
    //  - repartition(line) + groupBy: fastest here (17 s @32c) but NO
    //    map-side combine — every raw occurrence of a hot footer
    //    crosses the shuffle to ONE task, and the op's motivating
    //    corpus (a footer on 10^11 pages) is then its own skew bomb;
    //  - two-stage (line, input-partition) combine with explicit
    //    exchanges: skew-safe but ships every raw row (926 MB vs
    //    ~530) and double-hashes — slowest (32-35 s);
    //  - bare groupBy: map-side partial agg combines hot lines per
    //    task (skew-safe) and ships one row per task-distinct line —
    //    optimal bytes at any skew. Its one artifact: AQE's 64 MB
    //    advisory can under-parallelize the final merge of a
    //    unique-heavy line universe (32c ≈ 8c on this local corpus);
    //    on a cluster, lower
    //    spark.sql.adaptive.advisoryPartitionSizeInBytes if the merge
    //    stage profile shows it — a session knob, not an operator
    //    shape.
    docs
      .select(explode(array_distinct(split(col("text"), "\n"))).as("line"))
      .where(length(col("line")) > 0)
      .groupBy("line").agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
      .select("line")

  /** The enforcement half of [[dedupLines]], fed from a PRECOMPUTED
    * boilerplate relation ([[boilerplateLines]]'s output, typically
    * lake-resident): strips every occurrence of the given lines and
    * rebuilds `text`. Batch/lake shape — the drop-position regroup is
    * an aggregation, so on a STREAM use [[dedupLinesStream]] (the
    * boilerplate set rides a closure; no join, no agg) or run this arm
    * per micro-batch via foreachBatch.
    *
    * CONTRACT: `doc_id` must be unique (the corpus primary key, as
    * everywhere in this pipeline) — drop positions merge per doc_id,
    * so duplicate ids would cross-apply one row's drops to another
    * row's text.
    */
  def dedupLinesFromBoiler(docs: DataFrame, boiler: DataFrame,
                           broadcastBoiler: Boolean = true): DataFrame = {
    val nPart = docs.sparkSession.sessionState.conf.numShufflePartitions
    val lineArr = split(col("text"), "\n")
    // EXPLICIT partition counts on every exchange (same discipline as
    // the CC loop / banding engine): the rows are small but the stages
    // are CPU-bound, and AQE's byte advisory coalesces them to a
    // handful of tasks otherwise (measured: 8→32c 1.56× before, ~3×
    // after, isolated kernel)
    val hintedBoiler =
      if (broadcastBoiler) broadcast(boiler) else boiler.hint("shuffle_hash")
    val drops = docs
      .select(col("doc_id"), posexplode(lineArr).as(Seq("pos", "line")))
      .join(hintedBoiler, "line")
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("pos"))).as("__drop"))
      .repartition(nPart, col("doc_id"))
    val outCols = docs.columns.map {
      case "text" => array_join(col("__kept"), "\n").as("text")
      case c => col(c)
    }
    docs.repartition(nPart, col("doc_id"))
      .join(drops, Seq("doc_id"), "left")
      .withColumn("__kept",
        when(col("__drop").isNull, lineArr)
          .otherwise(filter(lineArr,
            (_, i) => not(array_contains(col("__drop"), i)))))
      .select(outCols.toIndexedSeq :+
        (size(lineArr) - size(col("__kept"))).cast("long")
          .as("n_lines_removed"): _*)
  }

  /** STREAMING arm of [[dedupLines]]: the boilerplate set rides the UDF
    * closure (one broadcast), the rebuild is a narrow per-row filter —
    * no join, no aggregation, so it runs under readStream in append
    * mode and is row-for-row identical to the batch arm (spec-pinned).
    * The set must fit the executor heap — the CCNet shape, where the
    * boilerplate table is orders of magnitude smaller than the corpus
    * (a few million lines is fine); past that, run
    * [[dedupLinesFromBoiler]] per micro-batch via foreachBatch.
    */
  def dedupLinesStream(docs: DataFrame, boiler: Set[String]): DataFrame = {
    val strip = udf { (text: String) =>
      val lines = text.split("\n", -1)
      val kept = lines.filterNot(boiler.contains)
      (kept.mkString("\n"), (lines.length - kept.length).toLong)
    }
    val outCols = docs.columns.map {
      case "text" => col("__s._1").as("text")
      case c => col(c)
    }
    // null text passes through as null (n_lines_removed null) — the
    // batch arm's split(null) behavior, pinned by the equivalence spec
    docs.withColumn("__s",
      when(col("text").isNull, lit(null)).otherwise(strip(col("text"))))
      .select(outCols.toIndexedSeq :+
        col("__s._2").as("n_lines_removed"): _*)
  }
}
