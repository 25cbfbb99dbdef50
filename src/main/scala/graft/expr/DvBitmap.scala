package graft.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BooleanType, DataType}

/** IN-SCAN deletion-vector filtering — the engine's answer to Delta's
  * DV bitmap readers, built at the public-API level: per-file delete
  * bitmaps (packed `long[]` words keyed by file path) are built
  * DISTRIBUTIVELY from the DV sidecar, broadcast once per executor,
  * and probed by a codegen'd predicate inside the dirty-file scan's
  * whole-stage-codegen span.
  *
  * Why it exists: subtracting DVs as a broadcast ANTI-JOIN is correct
  * but pays Spark's row-at-a-time join machinery on EVERY dirty-file
  * row — measured at ~4.5 s per 60 M rows on the round-7 probe even
  * with dictionary-coded join sides (the join floor, not an
  * implementation overhead). A bitmap probe is two array reads and a
  * mask per row, stays inside codegen, and needs no join build side —
  * the scan filters itself, exactly like Delta's in-reader bitmaps.
  *
  * Memory contract: one bitmap word per 64 rows of a dirty file's max
  * deleted row index — a 10 M-row file costs ≤ 1.25 MB REGARDLESS of
  * how many rows are deleted, and only DIRTY files have bitmaps at
  * all. [[graft.operators.Snapshots]] budgets the total and falls back
  * to the anti-join when a mass delete blows past it (the bitmap is
  * deletion-LOCALITY-sized; the join is deletion-COUNT-sized — each is
  * right on its own side of the crossover).
  */
object DvBitmap {

  /** Distributive word-array bitmap build: `reduce` sets one bit per
    * row index (growing geometrically), `merge` ORs partial bitmaps —
    * a classic commutative monoid, so the per-file bitmap builds
    * map-side with no row shuffle beyond the final per-file merge. */
  private class BitsetAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], ri: Long): Array[Long] = {
      val wi = (ri >>> 6).toInt
      val g =
        if (wi < b.length) b
        else java.util.Arrays.copyOf(b, math.max(wi + 1, b.length * 2))
      g(wi) |= 1L << ri
      g
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
      var i = 0
      while (i < small.length) { big(i) |= small(i); i += 1 }
      big
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  private val bitsetUdaf = functions.udaf(new BitsetAgg, Encoders.scalaLong)

  /** Build the per-file bitmaps from a `(file_path, row_index)` frame
    * (pre-filtered to the dirty files) and broadcast them. The
    * aggregation ships only finished word arrays to the driver — never
    * the row positions — so the driver/broadcast cost is the bitmap
    * budget itself. */
  def buildBroadcast(spark: SparkSession, dv: DataFrame)
      : Broadcast[java.util.HashMap[String, Array[Long]]] = {
    val rows = dv.groupBy(col("file_path"))
      .agg(bitsetUdaf(col("row_index")).as("words"))
      .collect()
    val m = new java.util.HashMap[String, Array[Long]](rows.length * 2)
    rows.foreach(r => m.put(r.getString(0), r.getSeq[Long](1).toArray))
    spark.sparkContext.broadcast(m)
  }

  // Small LRU of built bitmap broadcasts. DV sidecars and the files
  // they reference are IMMUTABLE, so a key of (context, sidecar set,
  // dirty set) fully determines the bitmap content — repeated reads of
  // the same snapshot state (a serving layer, a bench's warm runs, a
  // COW rewrite right after discovery) reuse the broadcast instead of
  // re-running the build job. Evicted entries are reclaimed by Spark's
  // ContextCleaner once unreferenced; capacity bounds driver footprint
  // at ~maxEntries × dvBitmapMaxBytes worst case.
  private val cacheCapacity = 8
  private val cache =
    new java.util.LinkedHashMap[String,
        Broadcast[java.util.HashMap[String, Array[Long]]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String,
            Broadcast[java.util.HashMap[String, Array[Long]]]]): Boolean =
        size() > cacheCapacity
    }

  /** In-flight builds keyed like [[cache]] — concurrent readers of the
    * SAME state share one build; readers of DIFFERENT states build in
    * parallel (the global lock only guards map gets/puts, never the
    * Spark aggregation itself, which previously serialized every
    * concurrent DV'd read across all tables behind one build). */
  private val inflight = new java.util.concurrent.ConcurrentHashMap[String,
    java.util.concurrent.CompletableFuture[Broadcast[java.util.HashMap[String, Array[Long]]]]]()

  /** Constant-size content key: the sorted path lists are hashed (a
    * 10⁵-dirty-file read would otherwise build a multi-MB key string
    * per read), with a NUL joiner no filesystem path can contain. */
  private def contentKey(appId: String, dvFiles: Seq[String],
      dirtyFiles: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def fold(xs: Seq[String]): Unit = {
      xs.sorted.foreach { x =>
        md.update(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        md.update(0.toByte)
      }
      md.update(1.toByte) // list separator — ([a],[]) never collides with ([],[a])
    }
    fold(dvFiles); fold(dirtyFiles)
    appId + "|" + java.util.Base64.getEncoder.encodeToString(md.digest())
  }

  /** [[buildBroadcast]] memoized on the immutable inputs. `dvFiles` and
    * `dirtyFiles` identify the content; the application id scopes the
    * key to the live SparkContext (a broadcast from a stopped context
    * must never be served). */
  def cachedBroadcast(spark: SparkSession, dvFiles: Seq[String],
      dirtyFiles: Seq[String], dv: => DataFrame)
      : Broadcast[java.util.HashMap[String, Array[Long]]] = {
    val key = contentKey(spark.sparkContext.applicationId, dvFiles, dirtyFiles)
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) return hit
    }
    val fut = new java.util.concurrent.CompletableFuture[
      Broadcast[java.util.HashMap[String, Array[Long]]]]()
    val prev = inflight.putIfAbsent(key, fut)
    if (prev != null) {
      // someone else is building this state; rethrow THEIR failure as
      // the ORIGINAL exception — join() wraps in CompletionException,
      // which would change the error type callers map on (a 400-class
      // IllegalArgumentException must not become a 500 on the thread
      // that lost the build race)
      try return prev.join()
      catch {
        case e: java.util.concurrent.CompletionException if e.getCause != null =>
          throw e.getCause
      }
    }
    try {
      val built = buildBroadcast(spark, dv)
      cache.synchronized { cache.put(key, built) }
      fut.complete(built)
      built
    } catch {
      case t: Throwable => fut.completeExceptionally(t); throw t
    } finally inflight.remove(key)
  }

  /** Predicate column: true iff `(filePath, rowIndex)` is marked
    * deleted in the broadcast bitmaps. Readers filter with `!deleted`. */
  def deleted(bitmaps: Broadcast[java.util.HashMap[String, Array[Long]]],
      filePath: Column, rowIndex: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(DvBitmapDeleted(expression(filePath), expression(rowIndex), bitmaps))
  }
}

/** `(file_path, row_index) → bit` probe against broadcast per-file
  * delete bitmaps. The file path is CONSTANT for long runs of rows (a
  * scan emits one file's rows consecutively), so the generated code
  * memoizes the last path's word array and re-probes the hash map only
  * on a file boundary — the per-row cost is one `UTF8String.equals`
  * (usually an early-out on length) plus two array reads and a mask,
  * all inside whole-stage codegen. NULL inputs read as "not deleted". */
case class DvBitmapDeleted(filePath: Expression, rowIndex: Expression,
    bitmaps: Broadcast[java.util.HashMap[String, Array[Long]]])
  extends Expression with Serializable {

  override def children: Seq[Expression] = Seq(filePath, rowIndex)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "dv_bitmap_deleted"

  override def eval(input: InternalRow): Any = {
    val p = filePath.eval(input)
    val ri = rowIndex.eval(input)
    if (p == null || ri == null) false
    else {
      val words = bitmaps.value.get(p.toString)
      if (words == null) false
      else {
        val i = ri.asInstanceOf[Long]
        val wi = (i >>> 6).toInt
        wi < words.length && (words(wi) & (1L << i)) != 0L
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("dvBitmapsBc", bitmaps,
      classOf[Broadcast[_]].getName)
    val mapVar = ctx.addMutableState("java.util.HashMap", "dvMap",
      v => s"$v = (java.util.HashMap) $bcRef.value();")
    val utf8 = "org.apache.spark.unsafe.types.UTF8String"
    // memoized per-file lookup: `lastPath` must be CLONED — the scan's
    // UTF8String may point into a buffer reused for the next row
    val lastPath = ctx.addMutableState(utf8, "dvLastPath")
    val lastWords = ctx.addMutableState("long[]", "dvLastWords")
    val pathGen = filePath.genCode(ctx)
    val riGen = rowIndex.genCode(ctx)
    val wi = ctx.freshName("dvWi")
    ev.copy(code =
      code"""
        ${pathGen.code}
        ${riGen.code}
        boolean ${ev.value} = false;
        if (!${pathGen.isNull} && !${riGen.isNull}) {
          if ($lastPath == null || !$lastPath.equals(${pathGen.value})) {
            $lastPath = ${pathGen.value}.clone();
            $lastWords = (long[]) $mapVar.get(${pathGen.value}.toString());
          }
          if ($lastWords != null) {
            int $wi = (int) (${riGen.value} >>> 6);
            ${ev.value} = $wi < $lastWords.length &&
              ($lastWords[$wi] & (1L << ${riGen.value})) != 0L;
          }
        }
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(filePath = newChildren(0), rowIndex = newChildren(1))
}
