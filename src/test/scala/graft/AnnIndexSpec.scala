package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftTable
import graft.operators.Similarity

/** The persisted IVF index lifecycle: build ≡ ad-hoc ivfTopK (shared
  * construction, exact equality), file skipping on the clustered
  * postings, and incremental refresh that folds new vectors in without
  * retraining. */
class AnnIndexSpec extends AnyFunSuite with SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ivf").toString

  test("ivfIndexTopK over a built index equals ad-hoc ivfTopK exactly") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
    val idx = tmp() + "/ivf"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx, nlist = 16)
    val fromIndex = canon(
      Similarity.ivfIndexTopK(spark, idx, q, "vec_id", "embedding", 5, nprobe = 4))
    val adHoc = canon(
      Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5, nlist = 16, nprobe = 4))
    assert(fromIndex == adHoc)
  }

  test("postings scan skips unprobed-list files; probed-list set is centroid-bounded") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = tmp() + "/ivf"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx, nlist = 16, numFiles = 8)
    // one query probing one list → only files whose list_id range holds
    // that list are read
    val q1 = emb.filter(col("vec_id") === 3)
    Similarity.ivfIndexTopK(spark, idx, q1, "vec_id", "embedding", 5, nprobe = 1)
      .count(): Unit
    // assert the skip at the scan layer directly
    val cent = GraftTable.read(spark, s"$idx/centroids").select("cent_id")
      .orderBy("cent_id").limit(1).collect()(0).get(0)
    val scan = GraftTable.readPrunedIn(spark, s"$idx/postings", "list_id", Seq(cent))
    assert(scan.filesRead < scan.filesTotal,
      s"expected file skipping, read ${scan.filesRead}/${scan.filesTotal}")
  }

  test("refresh assigns new vectors to persisted centroids; queries then find them") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") < 100)
    val idx = tmp() + "/ivf"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx, nlist = 8)
    // new vectors with ids ABOVE every existing id: the deterministic
    // centroid set (lowest nlist ids) is unchanged, so index+refresh must
    // equal an ad-hoc run over the full corpus
    val more = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") >= 100 && col("vec_id") < 150)
    Similarity.refreshIvfIndex(spark, idx, more, "vec_id", "embedding")
    val full = emb.unionByName(more)
    val q = emb.filter(col("vec_id") < 10)
    val fromIndex = canon(
      Similarity.ivfIndexTopK(spark, idx, q, "vec_id", "embedding", 5, nprobe = 4))
    val adHoc = canon(
      Similarity.ivfTopK(q, full, "vec_id", "embedding", 5, nlist = 8, nprobe = 4))
    assert(fromIndex == adHoc)
    // a re-ingested vector replaces its posting, never duplicates it
    Similarity.refreshIvfIndex(spark, idx, more, "vec_id", "embedding")
    val postings = GraftTable.read(spark, s"$idx/postings")
    assert(postings.count() == postings.select("neighbor_id").distinct().count())
  }
}
