package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.BenchSf1

/** The sf1 stress corpus must actually BE testdata-shaped — a generator
  * that drifts from the driver distribution (vocab, lengths, plant
  * rates) would stress a different workload than the one the gate
  * queries run. Checked at sf0.1 scale (5,000 docs) against the
  * distribution measured on /root/testdata/sf0.1/documents.parquet.
  */
class BenchSf1Spec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("graft-sf1-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("sf1Documents matches the testdata documents distribution") {
    import spark.implicits._
    val docs = BenchSf1.sf1Documents(spark, 5000L).cache()
    try {
      // schema parity with the driver table
      assert(docs.columns.toSeq ==
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      // 31-word vocabulary, uniform 10..100 words per doc
      val words = docs.select(explode(split(col("text"), " ")).as("w"))
      assert(words.select("w").distinct().count() == 31)
      val wc = docs.select(size(split(col("text"), " ")).as("n"))
        .agg(min("n"), max("n")).as[(Int, Int)].head()
      assert(wc == ((10, 100)), s"word-count range $wc != (10,100)")
      // exact-dup plants: 16 docs in 8 pair groups per 5000
      // (2/625 — the measured testdata rate)
      val dupDocs = docs.groupBy("text").count().where(col("count") > 1)
        .agg(coalesce(sum("count"), lit(0L)), count(lit(1))).as[(Long, Long)].head()
      assert(dupDocs == ((16L, 8L)),
        s"exact-dup (docs, groups) $dupDocs != (16, 8)")
      // near-dup plants: each i % 25 == 7 doc shares its 80% word prefix
      // with doc i-1 — verify on a concrete plant
      val pair = docs.where(col("doc_id").isin(6L, 7L))
        .orderBy("doc_id").select("text").as[String].collect()
      val w6 = pair(0).split(" ")
      val w7 = pair(1).split(" ")
      val shared = w7.length * 4 / 5
      assert(shared > 0 && w7.take(shared).sameElements(w6.take(shared)),
        "near plant 7 does not share its 80% prefix with doc 6")
      // language mass ≈ measured (en .41, others .14-.15 each)
      val en = docs.where(col("lang") === "en").count().toDouble / 5000
      assert(math.abs(en - 0.41) < 0.03, s"en share $en drifted from 0.41")
      assert(docs.select("lang").distinct().count() == 5)
      assert(docs.select("source").distinct().count() == 20)
      // determinism across re-evaluation (no randomness anywhere)
      val again = BenchSf1.sf1Documents(spark, 5000L)
      assert(docs.exceptAll(again).isEmpty && again.exceptAll(docs).isEmpty)
    } finally { docs.unpersist(); () }
  }
}
