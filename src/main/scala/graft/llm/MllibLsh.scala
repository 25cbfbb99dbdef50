package graft.llm

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, CountVectorizer, MinHashLSH}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-backed LSH variants (SURVEY.md §2.12) — the library-native
  * alternatives to the hand-rolled [[Dedup.minhashCandidatePairs]] and
  * [[Similarity.lshTopK]]:
  *
  *  - `MinHashLSH` over a CountVectorizer'd shingle vocabulary for
  *    Jaccard-similarity joins (`approxSimilarityJoin` is a bucketed
  *    join, never corpus²);
  *  - `BucketedRandomProjectionLSH` over dense embedding vectors for
  *    Euclidean-neighbor search.
  *
  * These fit a model (vocabulary / random planes) and are therefore
  * seeded-deterministic rather than engine-portable — verified in
  * ScalaTest against the exact operators, not the DuckDB oracle.
  */
object MllibLsh {

  /** Near-duplicate pairs by approximate Jaccard distance over word
    * 3-gram shingle sets. */
  def minhashDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxJaccardDistance: Double, numHashTables: Int = 8): DataFrame = {
    val withShingles = docs
      .filter(size(split(col(textCol), " ")) >= 3)
      .withColumn("shingles", Dedup.shingles3(col(textCol)))
    val cv = new CountVectorizer()
      .setInputCol("shingles").setOutputCol("features").setBinary(true)
      .fit(withShingles)
    val vectorized = cv.transform(withShingles)
      // MinHashLSH requires at least one non-zero entry
      .filter(col("shingles").isNotNull && size(col("shingles")) > 0)
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
      .fit(vectorized)
    lsh.approxSimilarityJoin(vectorized, vectorized, maxJaccardDistance, "jaccard_dist")
      .select(
        col(s"datasetA.$idCol").as("doc_a"),
        col(s"datasetB.$idCol").as("doc_b"),
        col("jaccard_dist"))
      .filter(col("doc_a") < col("doc_b"))
  }

  /** Approximate nearest neighbors by Euclidean distance over the
    * embedding column (`Array[Float]` → dense Vector). */
  def euclideanNeighbors(corpus: DataFrame, idCol: String, vecCol: String,
      key: Array[Float], k: Int, bucketLength: Double = 2.0): DataFrame = {
    val spark = corpus.sparkSession
    val toVec = org.apache.spark.sql.functions.udf { (a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray)
    }
    val vectorized = corpus.withColumn("features", toVec(col(vecCol)))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(4).setSeed(42L)
      .fit(vectorized)
    lsh.approxNearestNeighbors(vectorized,
        Vectors.dense(key.map(_.toDouble)), k, "dist")
      .select(col(idCol), col("dist"))
  }
}
