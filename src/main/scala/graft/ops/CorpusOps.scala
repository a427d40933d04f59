package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The interleaved text+media document corpus (BASELINE.json
  * `input_hint`): `doc_id: string, spans: array<struct<kind: string,
  * text: string, media_ref: string, offset: int>>`.
  *
  * The corpus is synthesized deterministically from the driver's
  * `documents` table (doc_id-driven integer arithmetic only, FIXTURES.md
  * §3) so the DuckDB oracle can rebuild it bit-for-bit in SQL — no
  * randomness, no external data.
  *
  * The per-row invariant enforced by every pipeline here: the span
  * sequence `(kind, text, media_ref)` ordered by `offset` survives any
  * explode/shuffle/reassemble exactly (verified via an md5 over the
  * ordered concatenation).
  */
object CorpusOps {

  /** Deterministic spans for numeric id `i`:
    * n = 1 + (i mod 7); offset = 0..n-1; kind cycles text/media/geo by
    * (i + offset) mod 3; geo spans carry "POINT(lon lat)" with
    * milli-degree lattice coordinates.
    */
  def interleavedDocs(docs: DataFrame): DataFrame = {
    val i = col("doc_id")
    def kindOf(off: Column): Column = {
      val m = (i + off) % 3
      when(m === 0, "text").when(m === 1, "media").otherwise("geo")
    }
    def lon(off: Column): Column =
      lit(-180.0) + ((i * 9973L + off * 7919L) % 360000L).cast("double") / 1000.0
    def lat(off: Column): Column =
      lit(-90.0) + ((i * 6271L + off * 4409L) % 180000L).cast("double") / 1000.0
    def textOf(off: Column): Column = {
      val m = (i + off) % 3
      when(m === 0, format_string("tok-%d-%d", i, off))
        .when(m === 1, lit(""))
        .otherwise(format_string("POINT(%.3f %.3f)", lon(off), lat(off)))
    }
    def mediaOf(off: Column): Column = {
      val m = (i + off) % 3
      when(m === 1, format_string("media://%d/%d", i, off)).otherwise(lit(""))
    }
    val n = (i % 7 + 1).cast("int")
    // `spans` listed BEFORE the `doc_id` alias: Spark's lateral column
    // alias resolution would otherwise bind col("doc_id") inside the
    // lambda to the new STRING alias instead of the input long column.
    docs.select(
      transform(sequence(lit(0), n - 1), off =>
        struct(kindOf(off).as("kind"), textOf(off).as("text"),
          mediaOf(off).as("media_ref"), off.cast("int").as("offset"))).as("spans"),
      format_string("doc-%012d", i).as("doc_id"))
      .select("doc_id", "spans")
  }

  /** Explode spans to one row each, carrying the (doc_id, offset) order
    * key — the only shape in which spans ever travel through a shuffle.
    *
    * OUTER explode on purpose (round 9): spans are never null/empty by
    * construction (n = i%7+1 ≥ 1), so the output is identical to the
    * inner explode — but the inner form triggers Catalyst's
    * InferFiltersFromGenerate, whose `size(spans) > 0 AND
    * isnotnull(spans)` filter is then pushed through the projection and
    * re-evaluates the ENTIRE span-construction expression (two
    * format_string("%.3f") per geo span) two extra times per document
    * (measured: the whole-corpus parse dropped ~3× — it sat
    * single-threaded inside every geo-deriving query's first stage).
    */
  def explodedSpans(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"), explode_outer(col("spans")).as("sp"))
      .select(col("doc_id"), col("sp.kind").as("kind"), col("sp.text").as("text"),
        col("sp.media_ref").as("media_ref"), col("sp.offset").as("offset"))

  /** Round-trip the spans through explode + shuffle + ordered reassembly
    * and emit the sequence digest — equality of this digest with the
    * direct digest IS the span-sequence invariant.
    */
  def spanSequenceDigest(corpus: DataFrame): DataFrame =
    explodedSpans(corpus)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("offset"), col("kind"), col("text"),
              col("media_ref")))),
            x => concat_ws("|", x.getField("kind"), x.getField("text"),
              x.getField("media_ref"))),
          "#").cast("binary")).as("seq_md5"))

  /** Content-addressed media dedup over the interleaved corpus — the
    * cross-modality arm: two documents are media-duplicates when their
    * ORDERED media-span payload sequence is byte-identical, no matter
    * how their media_refs (URLs, CDN mirrors) or text spans differ —
    * the "same images re-wrapped in new boilerplate" modality of a
    * training pipeline.
    *
    * `media` is any `(media_ref, payload)` relation resolving refs to
    * bytes. The content address is `md5(lower(hex(payload)))` — a pure
    * function of the bytes, chosen over md5-of-blob so the DuckDB
    * oracle (VARCHAR-only md5) reproduces it exactly.
    *
    * Scale shape (3 keyed shuffles, no windows): media spans joined to
    * signatures on `media_ref` (AQE-broadcastable when the blob store
    * is dim-sized; skew-joinable otherwise), per-doc ordered digest as
    * one agg, then group stats by digest as a partial-agg groupBy with
    * a join back — a globally-hot digest (the blank-image case) stays
    * safe because the count partial-aggregates map-side and the join
    * back is AQE-skew-splittable, where a `Window over digest` would
    * pin the hot group to one task.
    *
    * Docs with no media spans have nothing to content-address and are
    * absent from the output by contract.
    */
  def mediaContentDedup(corpus: DataFrame, media: DataFrame): DataFrame = {
    val sigs = media.select(col("media_ref"),
      md5(lower(hex(col("payload"))).cast("binary")).as("content_md5"))
    val mspans = explodedSpans(corpus).where(col("kind") === "media")
      .select(col("doc_id"), col("offset"), col("media_ref"))
    // LEFT join + loud failure on an unresolved ref (round-6 ADVICE):
    // an inner join would silently DROP spans whose media_ref is absent
    // from `media`, so a doc's digest could cover only the resolved
    // subset and collide with a genuinely shorter-sequence doc —
    // partial resolution must never silently change dedup groups
    val resolved = mspans.join(sigs, Seq("media_ref"), "left")
      .withColumn("content_md5",
        when(col("content_md5").isNull, raise_error(concat(
          lit("mediaContentDedup: media_ref unresolved in media relation: "),
          col("media_ref")))).otherwise(col("content_md5")))
    val docSig = resolved
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_media"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("offset"), col("content_md5")))),
            x => x.getField("content_md5")),
          "#").cast("binary")).as("media_seq_md5"))
    val groups = docSig.groupBy("media_seq_md5")
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).cast("long").as("group_size"))
    docSig.join(groups, Seq("media_seq_md5"))
      .select(col("doc_id"), col("n_media"), col("media_seq_md5"),
        col("keep_doc_id"), col("group_size"),
        (col("doc_id") =!= col("keep_doc_id")).as("is_dup"))
  }

  /** Geometry extraction: geo spans parsed back to lon/lat (the doubles
    * the DGGS layer consumes) plus exact milli-degree integers for the
    * oracle.
    */
  def geoSpans(corpus: DataFrame): DataFrame = {
    val lonS = regexp_extract(col("text"), "POINT\\(([-0-9.]+) ([-0-9.]+)\\)", 1)
    val latS = regexp_extract(col("text"), "POINT\\(([-0-9.]+) ([-0-9.]+)\\)", 2)
    // ANSI-safe: the '' → DOUBLE cast must not blow up if Catalyst ever
    // evaluates the projection speculatively on non-geo rows (observed
    // once the extent join of binPointValsAll entered the plan); non-geo
    // rows are filtered out regardless
    def mdeg(s: Column): Column =
      round(when(s === "", lit(null)).otherwise(s).cast("double") * 1000.0).cast("long")
    explodedSpans(corpus)
      .where(col("kind") === "geo")
      .select(col("doc_id"), col("offset"),
        mdeg(lonS).as("lon_mdeg"),
        mdeg(latS).as("lat_mdeg"))
      // lon/lat rebuilt from the exact integer milli-degrees with a single
      // division — bit-identical on any IEEE engine (a parse of the
      // printed "%.3f" can differ from `-180.0 + k/1000.0` by 1 ulp)
      .withColumn("lon", col("lon_mdeg").cast("double") / 1000.0)
      .withColumn("lat", col("lat_mdeg").cast("double") / 1000.0)
      .select("doc_id", "offset", "lon", "lat", "lon_mdeg", "lat_mdeg")
  }
}
