package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.Base64
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-log`: a Kafka-SHAPED Structured Streaming source over a
  * partitioned append-only log on shared storage.
  *
  * Why this exists: the reference's streaming ingress is a Kafka
  * consumer (back_end/feature_store/stream_processing/pipeline.py:38-42),
  * but neither the `spark-sql-kafka` connector nor a broker is
  * available in this environment (zero-egress, fixed dependency set).
  * Rather than leave the ingress untested behind a construction smoke,
  * this implements the SAME contract as a first-class DataSourceV2
  * connector on public Spark API:
  *
  *  - Kafka-compatible row schema (`key binary, value binary, topic,
  *    partition, offset, timestamp`) — [[graft.stream.StreamPipeline.parse]]
  *    consumes either source unchanged; swapping in real Kafka at
  *    deployment is a one-line `format()` change.
  *  - Per-partition monotone offsets, committed through the streaming
  *    checkpoint: restart resumes exactly where the last batch
  *    committed — the exactly-once-source half of the recovery story.
  *  - Admission control ([[SupportsAdmissionControl]]): a
  *    `maxRecordsPerTrigger` option bounds micro-batch size exactly like
  *    Kafka's `maxOffsetsPerTrigger`, so a backlogged topic replays at a
  *    controlled rate.
  *  - One Spark input partition per (log partition, offset range): read
  *    parallelism = topic partitions, the Kafka scaling model.
  *
  * Storage layout: `<path>/p<N>.log`, one record per line,
  * `epochMillis,base64(key),base64(value)`. OFFSETS ARE BYTE POSITIONS
  * (like a real log): readers `seek` to the range start in O(1) instead
  * of skipping lines, and the driver's per-trigger end-offset probe is
  * INCREMENTAL — a cache of (bytes scanned → last complete-line end)
  * per file means each trigger scans only newly appended bytes, O(new
  * data) rather than O(log history). Only '\n'-TERMINATED lines are
  * visible: a torn append from an external producer (partial line, no
  * terminator yet) stays beyond the end offset until its newline lands,
  * so readers never parse half a record. Batch reads (`spark.read`)
  * scan the whole log — the "topic as a table" audit path.
  */
object LogTopic {

  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))

  final case class ProducerRecord(key: Option[String], value: String, tsMillis: Long)

  /** Create an empty topic directory with `nPartitions` log files. */
  def createTopic(dir: String, nPartitions: Int): Unit = {
    require(nPartitions >= 1)
    Files.createDirectories(Paths.get(dir))
    (0 until nPartitions).foreach { p =>
      val f = Paths.get(dir, s"p$p.log")
      if (!Files.exists(f)) Files.createFile(f)
    }
  }

  /** Append records: keyed records route by key hash (same key → same
    * partition → per-key ordering, the Kafka contract), unkeyed records
    * round-robin by arrival index. Appends are line-atomic per call. */
  def produce(dir: String, records: Seq[ProducerRecord]): Unit = {
    val parts = partitionFiles(dir)
    require(parts.nonEmpty, s"produce: no topic at $dir (createTopic first)")
    val n = parts.length
    val grouped = records.zipWithIndex.groupBy { case (r, i) =>
      r.key match {
        case Some(k) => math.floorMod(scala.util.hashing.MurmurHash3.stringHash(k), n)
        case None => math.floorMod(i, n)
      }
    }
    grouped.foreach { case (p, rs) =>
      val lines = rs.map { case (r, _) =>
        val k = r.key.map(s => Base64.getEncoder.encodeToString(s.getBytes(UTF_8))).getOrElse("")
        val v = Base64.getEncoder.encodeToString(r.value.getBytes(UTF_8))
        s"${r.tsMillis},$k,$v"
      }
      Files.write(parts(p), (lines.mkString("", "\n", "\n")).getBytes(UTF_8),
        StandardOpenOption.APPEND)
    }
  }

  def partitionFiles(dir: String): Array[java.nio.file.Path] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Array.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .filter(_.getFileName.toString.matches("p\\d+\\.log"))
        .toArray.sortBy(p => partitionId(p))
      finally s.close()
    }
  }

  def partitionId(p: java.nio.file.Path): Int =
    p.getFileName.toString.stripPrefix("p").stripSuffix(".log").toInt

  /** Driver-side incremental scan cache: file → (bytes examined,
    * byte position after the last '\n' seen, cumulative complete lines
    * from byte 0 through that position). A trigger re-reads only the
    * bytes appended since the previous trigger, and the line count
    * rides along for free — finite-budget admission control needs
    * per-partition BACKLOG ROWS every trigger, and without the count a
    * deep backlog would be rescanned per trigger (O(backlog), not the
    * O(new bytes) the source promises). */
  private val scanCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Long)]()

  /** file → (byte position → cumulative complete lines from 0).
    * Populated at every position the driver hands out (trigger start/
    * end offsets, admission-control advances), so backlog row counts
    * between any two handed-out positions are pure cache lookups.
    * After a restart the map is cold and the first trigger pays ONE
    * O(position) count per partition to re-seed it. Bounded: positions
    * below the smallest still-referenced offset are pruned once the
    * map exceeds a soft cap. */
  // value type is BOXED java.lang.Long deliberately: a Scala-Long-valued
  // java map silently unboxes an absent key's null to 0L, turning every
  // cache miss into "cumulative rows = 0" instead of a cold re-scan —
  // the boxed value keeps misses null-checkable
  private val rowPosCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ConcurrentHashMap[Long, java.lang.Long]]()
  private val RowPosCap = 4096

  private def posRows(fileKey: String): java.util.concurrent.ConcurrentHashMap[Long, java.lang.Long] =
    rowPosCache.computeIfAbsent(fileKey, _ => {
      val m = new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Long]()
      m.put(0L, 0L)
      m
    })

  private def recordPosRows(fileKey: String, pos: Long, rows: Long): Unit = {
    val m = posRows(fileKey)
    m.put(pos, rows)
    if (m.size > RowPosCap) {
      // prune the oldest half — committed streams only move forward
      val keys = m.keySet().toArray(Array.empty[java.lang.Long]).sorted
      keys.take(keys.length / 2).foreach(k => if (k != 0L) m.remove(k))
    }
  }

  /** Test hook: cold (full-scan) cumulative-row computations — steady
    * state must not grow this, or admission control is rescanning
    * backlogs per trigger. */
  @volatile private[graft] var coldRowScans: Long = 0L

  /** Cumulative complete lines from byte 0 to `pos` — cached; one
    * O(pos) scan on a cold position (restart re-seed), lookups after. */
  private[graft] def rowsAt(dir: String, partition: Int, pos: Long): Long = {
    if (pos == 0L) return 0L
    val p = Paths.get(dir, s"p$partition.log")
    val key = p.toAbsolutePath.toString
    val m = posRows(key)
    val hit = m.get(pos)
    if (hit != null) hit.longValue
    else {
      coldRowScans += 1
      val n = countRows(dir, partition, 0L, pos)
      recordPosRows(key, pos, n)
      n
    }
  }

  /** Byte position just past the last COMPLETE ('\n'-terminated) line —
    * the visible end of the partition. Incremental: O(new bytes). */
  private def completeEnd(p: java.nio.file.Path): Long = {
    val key = p.toAbsolutePath.toString
    val size = Files.size(p)
    val (scanned, end, rows) = scanCache.getOrDefault(key, (0L, 0L, 0L))
    if (size == scanned) end
    else if (size < scanned) { // truncated/recreated file: rescan
      scanCache.remove(key); rowPosCache.remove(key); completeEnd(p)
    } else {
      val ch = Files.newByteChannel(p, StandardOpenOption.READ)
      var newEnd = end
      var newRows = rows
      try {
        ch.position(scanned)
        val buf = java.nio.ByteBuffer.allocate(1 << 16)
        var pos = scanned
        while (pos < size) {
          buf.clear()
          val n = ch.read(buf)
          if (n <= 0) pos = size
          else {
            var i = 0
            while (i < n) {
              if (buf.get(i) == '\n') { newEnd = pos + i + 1; newRows += 1 }
              i += 1
            }
            pos += n
          }
        }
      } finally ch.close()
      scanCache.put(key, (size, newEnd, newRows))
      recordPosRows(key, newEnd, newRows)
      newEnd
    }
  }

  /** Current visible end offset (byte position) per partition. */
  def endOffsets(dir: String): Map[Int, Long] =
    partitionFiles(dir).map(p => partitionId(p) -> completeEnd(p)).toMap

  /** Scan forward from byte `from`, returning the position after at
    * most `maxRows` complete lines (bounded by `cap`) — the
    * row-budgeted advance of admission control. O(admitted bytes). */
  def advanceRows(dir: String, partition: Int, from: Long, maxRows: Long,
      cap: Long): Long = {
    if (maxRows <= 0 || from >= cap) return from
    val p = Paths.get(dir, s"p$partition.log")
    val ch = Files.newByteChannel(p, StandardOpenOption.READ)
    try {
      ch.position(from)
      val buf = java.nio.ByteBuffer.allocate(1 << 16)
      var pos = from
      var rows = 0L
      var last = from
      while (pos < cap && rows < maxRows) {
        buf.clear()
        val n = ch.read(buf)
        if (n <= 0) pos = cap
        else {
          var i = 0
          while (i < n && rows < maxRows) {
            if (pos + i < cap && buf.get(i) == '\n') { rows += 1; last = pos + i + 1 }
            i += 1
          }
          pos += n
        }
      }
      // seed the cumulative-rows cache at the position being handed out,
      // so the NEXT trigger's backlog count for this partition is a pure
      // lookup (only when `from` is already seeded — never force a scan)
      val key = p.toAbsolutePath.toString
      val base = posRows(key).get(from)
      if (base != null) recordPosRows(key, last, base.longValue + rows)
      last
    } finally ch.close()
  }

  /** Complete lines in [from, to) via the cumulative-position cache —
    * O(1) when both endpoints were handed out by this driver (every
    * steady-state trigger), one O(from) re-seed scan per partition
    * after a restart. This is what keeps finite-budget admission
    * control O(new bytes) per trigger even over a deep backlog. */
  def backlogRows(dir: String, partition: Int, from: Long, to: Long): Long =
    if (to <= from) 0L
    else rowsAt(dir, partition, to) - rowsAt(dir, partition, from)

  /** Count complete lines in [from, to) — rows a planned range holds. */
  def countRows(dir: String, partition: Int, from: Long, to: Long): Long = {
    if (to <= from) return 0L
    val p = Paths.get(dir, s"p$partition.log")
    val ch = Files.newByteChannel(p, StandardOpenOption.READ)
    try {
      ch.position(from)
      val buf = java.nio.ByteBuffer.allocate(1 << 16)
      var pos = from
      var rows = 0L
      while (pos < to) {
        buf.clear()
        val n = ch.read(buf)
        if (n <= 0) pos = to
        else {
          var i = 0
          while (i < n) {
            if (pos + i < to && buf.get(i) == '\n') rows += 1
            i += 1
          }
          pos += n
        }
      }
      rows
    } finally ch.close()
  }
}

/** Offsets: visible byte positions per partition, serialized as
  * canonical JSON (`{"0":123,"1":77}`, keys sorted) so equal offsets
  * compare equal as strings — the property checkpoint replay relies
  * on. */
case class LogOffsets(counts: Map[Int, Long]) extends Offset {
  override def json(): String =
    counts.toSeq.sortBy(_._1)
      .map { case (p, n) => s""""$p":$n""" }.mkString("{", ",", "}")
}

object LogOffsets {
  def parse(json: String): LogOffsets = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) LogOffsets(Map.empty)
    else LogOffsets(body.split(",").map { kv =>
      val Array(k, v) = kv.split(":").map(_.trim)
      k.stripPrefix("\"").stripSuffix("\"").toInt -> v.toLong
    }.toMap)
  }
}

class LogTopicProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = LogTopic.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "graft-log: .option(\"path\", <topic dir>) is required")
    new LogTopicTable(path,
      Option(properties.get("maxRecordsPerTrigger")).map(_.toLong))
  }
}

class LogTopicTable(path: String, maxPerTrigger: Option[Long])
    extends Table with SupportsRead {
  override def name(): String = s"graft-log:$path"
  override def schema(): StructType = LogTopic.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LogTopicScan(path, maxPerTrigger)
    }
}

class LogTopicScan(path: String, maxPerTrigger: Option[Long]) extends Scan {
  override def readSchema(): StructType = LogTopic.schema
  override def description(): String = s"graft-log $path"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LogTopicMicroBatchStream(path, maxPerTrigger)
  override def toBatch(): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val end = LogTopic.endOffsets(path)
      end.toSeq.sortBy(_._1).collect {
        case (p, n) if n > 0 => LogInputPartition(path, p, 0L, n): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = new LogReaderFactory
  }
}

class LogTopicMicroBatchStream(path: String, maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset =
    LogOffsets(LogTopic.endOffsets(path).map { case (p, _) => p -> 0L })

  override def deserializeOffset(json: String): Offset = LogOffsets.parse(json)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  /** Advance each partition toward the live end, spending at most the
    * row budget. FAIR under scarcity: when the budget covers all
    * backlogged partitions, a water-fill (ascending backlog, surplus
    * flows to the hungriest) gives every partition ~budget/n rows; when
    * the budget is SMALLER than the number of backlogged partitions,
    * the most-behind partitions are served first — an unserved
    * partition's backlog only grows, so it reaches the front within a
    * bounded number of triggers and no partition starves (the Kafka
    * proportional-admission behavior). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[LogOffsets].counts
    val end = LogTopic.endOffsets(path)
    val budget = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => Long.MaxValue
    }
    // backlog measured in ROWS only when a finite budget needs it —
    // through the cumulative-position cache, so a deep backlog is NOT
    // rescanned per trigger (one re-seed scan per partition after a
    // restart, pure lookups in steady state)
    val states = end.toSeq.sortBy(_._1).map { case (p, e) =>
      (p, from.getOrElse(p, 0L), e)
    }
    if (budget == Long.MaxValue)
      return LogOffsets(states.map { case (p, _, e) => p -> e }.toMap)
    val withLag = states.map { case (p, s, e) =>
      (p, s, e, LogTopic.backlogRows(path, p, s, e))
    }
    val out = scala.collection.mutable.Map[Int, Long]()
    var remainingBudget = budget
    var remaining = withLag.filter(_._4 > 0)
    remaining =
      if (remainingBudget >= remaining.length) remaining.sortBy(t => (t._4, t._1))
      else remaining.sortBy(t => (-t._4, t._1)) // scarcity: hungriest first
    while (remaining.nonEmpty && remainingBudget > 0) {
      val share = math.max(1L, remainingBudget / remaining.length)
      val (p, s, e, lag) = remaining.head
      val rows = math.min(lag, math.min(share, remainingBudget))
      out(p) = LogTopic.advanceRows(path, p, s, rows, e)
      remainingBudget -= rows
      remaining = remaining.tail
    }
    LogOffsets(states.map { case (p, s, _) => p -> out.getOrElse(p, s) }.toMap)
  }

  override def reportLatestOffset(): Offset = LogOffsets(LogTopic.endOffsets(path))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LogOffsets].counts
    val e = end.asInstanceOf[LogOffsets].counts
    e.toSeq.sortBy(_._1).flatMap { case (p, endOff) =>
      val startOff = s.getOrElse(p, 0L)
      if (endOff > startOff) Some(LogInputPartition(path, p, startOff, endOff): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new LogReaderFactory
  override def commit(end: Offset): Unit = () // nothing to ack: the log is durable
  override def stop(): Unit = ()
}

/** Byte range [startByte, endByte) of one log partition. */
case class LogInputPartition(path: String, partition: Int,
    startByte: Long, endByte: Long) extends InputPartition

class LogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LogInputPartition]
    new PartitionReader[InternalRow] {
      private val topic = UTF8String.fromString(
        Paths.get(p.path).getFileName.toString)
      // O(1) positioning: seek straight to the range start — no
      // line-skip scan of everything before it
      private val in = {
        val raw = Files.newInputStream(Paths.get(p.path, s"p${p.partition}.log"))
        var toSkip = p.startByte
        while (toSkip > 0) { val k = raw.skip(toSkip); require(k > 0); toSkip -= k }
        new java.io.BufferedInputStream(raw, 1 << 16)
      }
      private var line: String = _
      private var pos = p.startByte     // byte position of the NEXT line start
      private var recordOffset = 0L     // byte position of the current record
      private val lineBuf = new java.io.ByteArrayOutputStream(256)

      override def next(): Boolean = {
        if (pos >= p.endByte) false
        else {
          // BYTE-accurate line framing: offsets are byte positions, so
          // the advance must count bytes actually consumed — this repo's
          // writer emits ASCII, but an EXTERNAL producer appending
          // multi-byte UTF-8 would silently desync a chars-as-bytes
          // accounting (`line.length + 1`) mid-range; reading raw bytes
          // and decoding per line keeps offsets exact for any charset
          lineBuf.reset()
          var consumed = 0L
          var b = in.read()
          while (b != -1 && b != '\n') { lineBuf.write(b); consumed += 1; b = in.read() }
          if (b == -1 && lineBuf.size() == 0) false
          else {
            if (b == '\n') consumed += 1
            recordOffset = pos
            pos += consumed
            line = new String(lineBuf.toByteArray, UTF_8)
            true
          }
        }
      }
      override def get(): InternalRow = try {
        val c1 = line.indexOf(',')
        val c2 = line.indexOf(',', c1 + 1)
        val ts = line.substring(0, c1).toLong
        val k = line.substring(c1 + 1, c2)
        val key = if (k.isEmpty) null else Base64.getDecoder.decode(k)
        val value = Base64.getDecoder.decode(line.substring(c2 + 1))
        InternalRow(key, value, topic, p.partition, recordOffset, ts * 1000L)
      } catch {
        // fail LOUDLY with the exact location: a record that isn't
        // `epochMillis,base64,base64` (external producer, corruption)
        // must name partition + byte offset, not surface as an opaque
        // decode error — and never be silently skipped
        case e @ (_: RuntimeException) =>
          throw new IllegalStateException(
            s"graft-log: malformed record at partition ${p.partition} " +
              s"byte offset $recordOffset (expected 'epochMillis,base64,base64'): " +
              s"'${line.take(80)}'", e)
      }
      override def close(): Unit = in.close()
    }
  }
}
