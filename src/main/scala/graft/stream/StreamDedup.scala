package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** One (band, bucket) probe of an arriving document. */
case class BandProbe(bucket: String, doc_id: Long, ts: Timestamp)

/** An arriving doc whose band bucket already held an earlier doc. */
case class NearDupFlag(doc_id: Long, band: Int, dup_of: Long, ts: Timestamp)

/** State per occupied band bucket: the first document that claimed it. */
case class BucketOwner(doc_id: Long, tsMs: Long)

/** Streaming near-duplicate SCREEN — the continuous-ingest analog of
  * [[graft.llm.Dedup.incrementalNearDups]] for the streaming plane: as
  * documents arrive, each is MinHash-signed per row (one compact UDF
  * evaluation — see [[StreamDedup.bandBucketsUdf]] for why the batch
  * side's composed column expressions are the wrong tool here), the
  * signature splits into `nBands` LSH bands, and a
  * `transformWithState` operator keyed by the band bucket remembers the
  * FIRST in-horizon document that claimed each bucket. An arrival whose
  * bucket is already owned by another doc is emitted as a
  * [[NearDupFlag]] — the standard b-band/r-row LSH screen, run
  * incrementally.
  *
  * Scale shape: one shuffle on the bucket key (uniform — md5 of the
  * band's minhashes), state is ONE small row per occupied bucket with
  * native state-store TTL bounding it to the ingest horizon, and
  * RocksDB state spills past executor heap for large horizons. A doc
  * emits at most `nBands` flags (one per colliding band); consumers
  * drop flagged docs or aggregate `min(dup_of)` per doc downstream.
  * Reference semantics: the batch band-bucket join of
  * `minhashCandidatePairs` (Dedup.scala) keyed continuously instead of
  * self-joined nightly.
  */
object StreamDedup {

  /** `nBands` bucket strings ("band:hash") for one document, as ONE
    * compact UDF evaluation per row.
    *
    * Why a UDF and not the composed column expression the batch side
    * uses: higher-order-function lambdas are interpreted (no codegen,
    * no common-subexpression elimination), and CollapseProject inlines
    * a projected signature alias into every consumer — measured on
    * sf0.1 docs, the composed `transform(bands, b → slice(sig, …))`
    * form re-built the shingle set nBands×n times per row (22 ms/doc;
    * 0.03 ms/doc for the signature itself). A batch pipeline breaks
    * that with a materialization barrier; a streaming projection has
    * none, so the signature+banding runs as plain Scala here —
    * `asNondeterministic()` pins it to a single evaluation per row
    * (Catalyst never duplicates or reorders nondeterministic exprs).
    * Docs with < 3 tokens have no shingles → no buckets → pass
    * unscreened (same convention as the batch MinHash family). */
  def bandBucketsUdf(n: Int, nBands: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(n % nBands == 0, s"n=$n must divide into nBands=$nBands")
    val r = n / nBands
    udf { (text: String) =>
      val toks = text.split(" ")
      val sh = scala.collection.mutable.HashSet.empty[String]
      var i = 0
      while (i + 2 < toks.length) {
        sh.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2)); i += 1
      }
      if (sh.isEmpty) Array.empty[String]
      else {
        val sig = Array.tabulate(n) { k =>
          var mn = Int.MaxValue
          val it = sh.iterator
          while (it.hasNext) {
            val h = scala.util.hashing.MurmurHash3.stringHash(it.next(), k)
            if (h < mn) mn = h
          }
          mn
        }
        Array.tabulate(nBands) { b =>
          val bandHash = scala.util.hashing.MurmurHash3.arrayHash(
            java.util.Arrays.copyOfRange(sig, b * r, (b + 1) * r), b)
          s"$b:${Integer.toHexString(bandHash)}"
        }
      }
    }.asNondeterministic()
  }

  /** The screen itself. `stateTtl=None` runs in TimeMode.None for
    * deterministic `processAllAvailable()` tests (same convention as
    * [[StreamPipeline.mergeStatsTws]]); production passes the ingest
    * horizon so the state store evicts stale buckets itself. */
  def nearDupScreen(docs: DataFrame, idCol: String, textCol: String,
      eventTimeCol: String, watermarkDelay: String,
      n: Int = 8, nBands: Int = 4,
      stateTtl: Option[java.time.Duration] = Some(java.time.Duration.ofDays(1))): Dataset[NearDupFlag] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val probes = docs
      .withWatermark(eventTimeCol, watermarkDelay)
      .select(col(idCol).cast("long").as("doc_id"),
        col(eventTimeCol).as("ts"),
        explode(bandBucketsUdf(n, nBands)(col(textCol))).as("bucket"))
      .select(col("bucket"), col("doc_id"), col("ts"))
      .as[BandProbe]
    val timeMode =
      if (stateTtl.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    probes.groupByKey(_.bucket)
      .transformWithState(new BucketScreenProcessor(stateTtl), timeMode,
        OutputMode.Append())
  }

  /** Keyed processor: first doc to touch a bucket owns it; later docs
    * in the horizon are flagged against the owner. The band index rides
    * in the key prefix and is recovered for the flag row. */
  class BucketScreenProcessor(ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, BandProbe, NearDupFlag] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var owner: ValueState[BucketOwner] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[BucketOwner]("bucketOwner",
        org.apache.spark.sql.Encoders.product[BucketOwner],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(bucket: String, in: Iterator[BandProbe],
        tv: TimerValues): Iterator[NearDupFlag] = {
      val band = bucket.takeWhile(_ != ':').toInt
      val out = Vector.newBuilder[NearDupFlag]
      var st = if (owner.exists()) Option(owner.get()) else None
      in.foreach { p =>
        st match {
          case Some(o) if o.doc_id != p.doc_id =>
            out += NearDupFlag(p.doc_id, band, o.doc_id, p.ts)
          case Some(_) => () // re-delivery of the owner itself
          case None =>
            st = Some(BucketOwner(p.doc_id, p.ts.getTime))
            owner.update(st.get)
        }
      }
      out.result().iterator
    }
  }
}
