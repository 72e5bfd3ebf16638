package graft.ann

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** The persisted-index contract: training artifacts on disk serve
  * searches with NO retraining and NO access to the corpus scan that
  * built them — proven by deleting the index's source before searching —
  * and search-from-disk reproduces the oracle-checked in-memory x19
  * composition row for row.
  */
class AnnIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("IVF-PQ search from the persisted index equals x19 after the source is deleted") {
    val base = tmpDir("ann_index_spec")
    val srcPath = s"$base/emb_copy"
    // build the index from a COPY of the embeddings so the source can die
    spark.read.parquet(s"$dir/embeddings.parquet").write.parquet(srcPath)
    AnnIndex.write(spark.read.parquet(srcPath), s"$base/index")
    spark.catalog.clearCache()
    // delete the source: any retraining / rescan now fails loudly
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(srcPath))
    try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
      .foreach(java.nio.file.Files.delete)
    finally walk.close()

    // the x19 query set (vec_id < 10), read back from the index itself
    val queries = spark.read.parquet(s"$base/index/vectors")
      .filter(col("cand_id") < 10)
      .select(col("cand_id").as("query_id"), col("v"), col("norm"))
    val got = AnnIndex.searchIvfPq(spark, s"$base/index", queries)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted
    val expected = SparkEntry.queries("x19_ann_ivf_pq")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted
    assert(got == expected)
    assert(got.nonEmpty)
    // the posting layout really is list-per-directory (partition pruning
    // = the IVF seek)
    val segs = {
      val ls = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$base/index/postings"))
      try ls.iterator().asScala.toSeq.map(_.getFileName.toString)
        .filter(_.startsWith("centroid_id="))
      finally ls.close()
    }
    assert(segs.size >= 2, s"postings not partitioned by list: $segs")
    spark.catalog.clearCache()
  }

  test("scaled-k index from disk equals x38 after the source is deleted") {
    import graft.queries.SimilarityQueries
    val base = tmpDir("ann_index_scaled")
    val srcPath = s"$base/emb_copy"
    spark.read.parquet(s"$dir/embeddings.parquet").write.parquet(srcPath)
    val src = spark.read.parquet(srcPath)
    val k = SimilarityQueries.scaledK(src.count())
    assert(k > 8, s"sf0.01 must exercise a genuinely scaled k, got $k")
    AnnIndex.write(src, s"$base/index", k = k)
    spark.catalog.clearCache()
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(srcPath))
    try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
      .foreach(java.nio.file.Files.delete)
    finally walk.close()

    // the trained list count really is k (broadcast-sized ≤ √n rows)
    assert(spark.read.parquet(s"$base/index/centroids").count() == k)
    val queries = spark.read.parquet(s"$base/index/vectors")
      .filter(col("cand_id") < 10)
      .select(col("cand_id").as("query_id"), col("v"), col("norm"))
    val got = AnnIndex.searchIvfPq(spark, s"$base/index", queries,
        nprobe = SimilarityQueries.scaledNprobe(k))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted
    val expected = SparkEntry.queries("x38_ann_ivf_pq_scaled")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted
    assert(got == expected)
    assert(got.nonEmpty)
    // the posting layout carries one directory per NON-EMPTY list — the
    // partition pruning a scaled probe leans on even harder (it reads
    // ⌈√k⌉ of these, not a constant quarter of them)
    val segs = {
      val ls = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$base/index/postings"))
      try ls.iterator().asScala.toSeq.map(_.getFileName.toString)
        .filter(_.startsWith("centroid_id="))
      finally ls.close()
    }
    val nonEmpty = spark.read.parquet(s"$base/index/postings")
      .select("centroid_id").distinct().count()
    assert(segs.size == nonEmpty && segs.size >= 2,
      s"scaled index layout: ${segs.size} dirs vs $nonEmpty non-empty lists")
    spark.catalog.clearCache()
  }

  test("append extends the index without retraining: new vectors become searchable, old results survive") {
    val base = tmpDir("ann_index_append")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // train on the first half only; the second half arrives later
    val (half1, half2) = (emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 2 =!= 0))
    AnnIndex.write(half1, s"$base/index")
    spark.catalog.clearCache()
    val preCounts = Seq("postings", "vectors")
      .map(d => spark.read.parquet(s"$base/index/$d").count())

    AnnIndex.append(spark, s"$base/index", half2)
    spark.catalog.clearCache()

    // row accounting: every appended vector landed in both layouts
    val n2 = half2.count()
    val postRows = spark.read.parquet(s"$base/index/postings")
    val vecRows = spark.read.parquet(s"$base/index/vectors")
    assert(vecRows.count() == preCounts(1) + n2)
    assert(postRows.count() == preCounts(0) + n2 * 8, "8 PQ codes per vector")
    // appended vectors carry codes from the EXISTING codebooks
    assert(postRows.join(spark.read.parquet(s"$base/index/codebooks"),
      Seq("s", "cid"), "left_anti").isEmpty, "code outside trained codebooks")

    // an appended vector queried against the index finds ITSELF top-1
    // (its nearest centroid is its assigned list, so the probe step
    // lands on it; cosine(self) = 1.0 beats everything else) — the
    // "searchable immediately, no retrain" contract
    val probeQ = vecRows.filter(col("cand_id") % 2 =!= 0).limit(5)
      .select((col("cand_id") + 1000000L).as("query_id"),
        col("v"), col("norm"), col("cand_id").as("self_id"))
      .cache()
    val got = AnnIndex.searchIvfPq(spark, s"$base/index",
        probeQ.select("query_id", "v", "norm"), k = 1)
      .join(probeQ.select("query_id", "self_id"), "query_id")
    assert(got.count() == 5)
    assert(got.filter(col("cand_id") =!= col("self_id")).isEmpty,
      "an appended vector is not its own nearest neighbor")
    probeQ.unpersist()
    spark.catalog.clearCache()
  }

  test("delete masks tombstoned vectors at once; compact folds them in; no retrain either way") {
    import graft.queries.SimilarityQueries
    val base = tmpDir("ann_index_delete")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    AnnIndex.write(emb, s"$base/index")
    spark.catalog.clearCache()
    val queries = SimilarityQueries.toVecs(emb).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v"), col("norm"))
      .cache()

    def search(k: Int): Seq[(Long, Long, Double, Int)] =
      AnnIndex.searchIvfPq(spark, s"$base/index", queries, k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq

    // delete every query's CURRENT top-1 — the harshest case: the next
    // candidate must be promoted, never a hole left at rank 1
    val pre = search(10)
    val victims = pre.filter(_._4 == 1).map(_._2).distinct
    assert(victims.nonEmpty)
    val trainedFiles = {
      import scala.jdk.CollectionConverters._
      Seq("centroids", "codebooks").flatMap { d =>
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(s"$base/index/$d"))
        try walk.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(f => (f.toString, java.nio.file.Files.size(f))).toList
        finally walk.close()
      }.sorted
    }

    import spark.implicits._
    AnnIndex.delete(spark, s"$base/index", victims.toDF("cand_id"))
    val post = search(3)
    // 1) a deleted id is never returned
    assert(post.forall(r => !victims.contains(r._2)), s"tombstoned id served: $post")
    // 2) recall on survivors is NEVER WORSE than the pre-delete ranking
    //    with the victims struck out and re-ranked: deleting at the
    //    postings frees ADC-shortlist slots, so a survivor that a
    //    victim squeezed out pre-delete may now enter and outrank the
    //    struck-out baseline — per-rank score may rise, never fall
    val struckBaseline = pre.groupBy(_._1).map { case (q, rs) =>
      q -> rs.sortBy(_._4).filterNot(r => victims.contains(r._2)).take(3)
        .zipWithIndex.map { case (r, i) => (r._2, r._3, i + 1) }
    }
    val postByQ = post.groupBy(_._1).map { case (q, rs) =>
      q -> rs.sortBy(_._4).map(r => (r._2, r._3, r._4))
    }
    struckBaseline.foreach { case (q, base) =>
      val got = postByQ.getOrElse(q, Nil)
      assert(got.map(_._3) == (1 to got.size).toList, s"rank hole for query $q: $got")
      base.zip(got).foreach { case ((bId, bScore, rank), (gId, gScore, _)) =>
        assert(gScore >= bScore - 1e-12,
          s"query $q rank $rank regressed: had ($bId, $bScore), got ($gId, $gScore)")
      }
      assert(got.size >= base.size, s"query $q under-filled: base=$base got=$got")
    }

    // 3) compaction folds tombstones into the files and clears the channel
    val preVec = spark.read.parquet(s"$base/index/vectors").count()
    val prePost = spark.read.parquet(s"$base/index/postings").count()
    AnnIndex.compact(spark, s"$base/index")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/index/tombstones")), "tombstones not cleared")
    assert(spark.read.parquet(s"$base/index/vectors").count() ==
      preVec - victims.size)
    assert(spark.read.parquet(s"$base/index/postings").count() ==
      prePost - victims.size * 8, "8 PQ codes per deleted vector")
    assert(search(3).toSet == post.toSet, "compaction changed the answer")
    // 4) no retrain: the trained artifacts are byte-for-byte untouched
    val trainedAfter = {
      import scala.jdk.CollectionConverters._
      Seq("centroids", "codebooks").flatMap { d =>
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(s"$base/index/$d"))
        try walk.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(f => (f.toString, java.nio.file.Files.size(f))).toList
        finally walk.close()
      }.sorted
    }
    assert(trainedAfter == trainedFiles, "delete/compact touched trained artifacts")
    // idempotent: compacting with no tombstones is a no-op
    AnnIndex.compact(spark, s"$base/index")
    queries.unpersist()
    spark.catalog.clearCache()
  }
}
