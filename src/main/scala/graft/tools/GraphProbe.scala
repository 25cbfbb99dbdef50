package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev probe (optimization r10): time pageRank formulation variants on
  * the real custSuppEdges input to separate fixed cost (edge build +
  * caches) from per-round cost, and test candidate optimizations
  * before they land in Graph.scala. Results → OPTIMIZATION_r10.md. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def edges(): DataFrame =
      graft.queries.NorthStar.custSuppEdges(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      } match { case ts =>
        println(f"$name%-34s ${ts.map(_._1).min}%8.2f s  rows=${ts.head._2}")
      }
    }

    // fixed part: edge derivation + distinct message-table build
    time("edges.count (no persist)")(edges().count())

    // variant harness: a pageRank copy with knobs
    def pr(iters: Int, lazyCkpt: Boolean, shJoin: Boolean,
        contractMsgs: Boolean, bcHint: Boolean = false): Long = {
      val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      def mat(df: DataFrame): DataFrame = {
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        cached += p; p
      }
      val e = mat(edges().select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")))
      val deg = mat(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
      val ed = mat(e.join(deg.hint("SHUFFLE_HASH"), "src").repartition(col("src")))
      var rank = deg.select(col("src").as("node"), lit(1000000L).as("rank"))
      var i = 1
      while (i <= iters) {
        val r = if (shJoin) rank.hint("SHUFFLE_HASH")
          else if (bcHint) broadcast(rank) else rank
        rank =
          if (contractMsgs)
            // contribution per src computed BEFORE the edge join: the
            // join output carries (dst, c) only
            ed.join(r.withColumn("c", expr("rank div deg")) // placeholder, unused
              , ed("src") === r("node"))
              .select(col("dst"), expr("rank div deg").as("c"))
              .groupBy(col("dst")).agg(sum(col("c")).as("m"))
              .select(col("dst").as("node"),
                (lit(150000L) + expr("(85 * m) div 100")).as("rank"))
          else
            ed.join(r, ed("src") === r("node"))
              .select(col("dst"), expr("rank div deg").as("c"))
              .groupBy(col("dst")).agg(sum(col("c")).as("m"))
              .select(col("dst").as("node"),
                (lit(150000L) + expr("(85 * m) div 100")).as("rank"))
        if (i % 3 == 0) rank = rank.localCheckpoint(!lazyCkpt)
        i += 1
      }
      val out = rank.localCheckpoint()
      cached.foreach(_.unpersist(blocking = false))
      out.count()
    }

    time("pr current (10 it)")(pr(10, lazyCkpt = false, shJoin = false, contractMsgs = false))
    time("pr lazy ckpt")(pr(10, lazyCkpt = true, shJoin = false, contractMsgs = false))
    time("pr SHUFFLE_HASH rank join")(pr(10, lazyCkpt = false, shJoin = true, contractMsgs = false))
    time("pr lazy + SH")(pr(10, lazyCkpt = true, shJoin = true, contractMsgs = false))
    time("pr 1 iter (fixed cost)")(pr(1, lazyCkpt = false, shJoin = false, contractMsgs = false))
    time("pr broadcast-hint rank")(pr(10, lazyCkpt = false, shJoin = false, contractMsgs = false, bcHint = true))
    time("pr bc-hint + lazy ckpt")(pr(10, lazyCkpt = true, shJoin = false, contractMsgs = false, bcHint = true))

    // the real operator for reference
    time("Graph.pageRank (real)")(
      graft.operators.Graph.pageRank(edges(), "src", "dst",
        iters = 10, assumeDistinct = true).count())
    spark.stop()
  }
}
