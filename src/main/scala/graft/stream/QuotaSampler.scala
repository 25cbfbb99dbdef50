package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** One admitted row per input doc under the cap. */
case class QuotaDoc(source: String, doc_id: Long, ts: Timestamp)
case class QuotaKept(doc_id: Long, source: String, n_taken: Long, ts: Timestamp)

/** Streaming per-source admission quota — the ingest rate-limiter a
  * pipeline puts in front of an expensive downstream stage (embedding,
  * decode, LLM scoring): the first `quota` docs per source pass,
  * everything after drops. The batch analog is
  * [[graft.llm.Shards.quotaSample]]; this is its continuous-ingest
  * twin: ONE shuffle on the source key into `transformWithState`,
  * state = a single running count per source (constant bytes/key,
  * TTL-evictable so quotas reset per retention horizon).
  *
  * Skew note: an exact counter is inherently per-key-serial — every
  * candidate row of a hot source routes through its key's task. The
  * per-row work is O(1) state read + compare (no buffering), so the
  * task is ingest-bound, not compute-bound; if a single source exceeds
  * one task's ingest ceiling, the documented relaxation is a salted
  * pre-quota (per-salt sub-quota of quota/k) accepting ±k admission
  * slack — same trade as any distributed counter. */
object QuotaSampler {

  /** `stateTtl=None` runs in TimeMode.None for deterministic
    * `processAllAvailable()` tests (same convention as
    * [[StreamDedup.nearDupScreen]]); production passes the retention
    * horizon so per-source counts reset with the state store's TTL. */
  def perSourceQuota(docs: DataFrame, idCol: String, sourceCol: String,
      eventTimeCol: String, quota: Long,
      stateTtl: Option[java.time.Duration] = Some(java.time.Duration.ofDays(1))): Dataset[QuotaKept] = {
    require(quota > 0, s"quota must be positive, got $quota")
    val spark = docs.sparkSession
    import spark.implicits._
    val typed = docs.select(col(sourceCol).cast("string").as("source"),
        col(idCol).cast("long").as("doc_id"),
        col(eventTimeCol).as("ts"))
      .as[QuotaDoc]
    val timeMode =
      if (stateTtl.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    typed.groupByKey(_.source)
      .transformWithState(new QuotaProcessor(quota, stateTtl), timeMode,
        OutputMode.Append())
  }

  /** Count so far for one source. */
  case class QuotaCount(n: Long)

  class QuotaProcessor(quota: Long, ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, QuotaDoc, QuotaKept] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var taken: ValueState[QuotaCount] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      taken = getHandle.getValueState[QuotaCount]("quotaTaken",
        org.apache.spark.sql.Encoders.product[QuotaCount],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(source: String, in: Iterator[QuotaDoc],
        tv: TimerValues): Iterator[QuotaKept] = {
      val out = Vector.newBuilder[QuotaKept]
      var n = if (taken.exists()) taken.get().n else 0L
      in.foreach { d =>
        if (n < quota) {
          n += 1
          out += QuotaKept(d.doc_id, source, n, d.ts)
        }
      }
      taken.update(QuotaCount(n))
      out.result().iterator
    }
  }
}
