package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scaling-fixture generator: writes a K×-replicated copy of an
  * sf dir's `documents` / `embeddings` tables so the heavy corpus
  * families can be measured one decade above the largest driver-provided
  * sf (TESTDATA.md tops out at sf0.1). Usage:
  *
  * {{{ runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <k> }}}
  *
  * Replication is REPLICA-TAGGED so the copy scales like a larger corpus
  * rather than a pathological one:
  *
  *  - `documents`: replica r ∈ [1, K) offsets `doc_id` by r·10⁷ and
  *    prefixes every word with `r<r>x` — all shingles become
  *    replica-distinct, so cross-replica jaccard is 0 and the true-pair
  *    count scales exactly K× (untagged copies would make every doc an
  *    exact dup of K−1 others: pair work K²×, which no real corpus
  *    growth looks like). Within a replica the dup structure is the
  *    original's. Caveat recorded in BASELINE.md: per-shingle df stays
  *    flat under tagging, while a real K× corpus also grows hot-key
  *    df's — that axis is covered by the salt fan-out's own specs
  *    (DedupSaltSpec) and the z9 skew profiler, not by this fixture.
  *  - `embeddings`: replica r offsets `vec_id` by r·10⁷ and perturbs
  *    each component by a deterministic hash-derived ±0.005 so replica
  *    twins are near but not identical (ANN/KNN/centroid costs stay
  *    honest; exact-duplicate vectors would collapse distance ties).
  *
  * Deterministic end-to-end (hash-based perturbation, no RNG), so two
  * runs produce byte-identical fixtures.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, kStr) = args.take(3)
    val k = kStr.toInt
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = graft.core.Sessions.local("graft-scaleup",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.core.Sessions.cpus))
    val offset = 10000000L

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docReplicas = (0 until k).map { r =>
      if (r == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(r * offset))
        .withColumn("text",
          concat(lit(s"r${r}x"), regexp_replace(col("text"), " ", s" r${r}x")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    docReplicas.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embReplicas = (0 until k).map { r =>
      if (r == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + lit(r * offset))
        .withColumn("embedding", expr(
          """transform(embedding, (x, i) ->
            |  cast(x + (pmod(hash(vec_id, i), 1000) - 500) / 1.0e5 as float))"""
            .stripMargin))
    }
    embReplicas.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // lineitem feeds x27's part co-purchase graph: offset BOTH
    // l_orderkey and l_partkey per replica so the graph grows as K
    // disjoint copies (K× nodes and edges — the shape of real growth),
    // instead of re-deriving the same distinct part-pair edges K times.
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until k).map { r =>
      if (r == 0) li
      else li
        .withColumn("l_orderkey", col("l_orderkey") + lit(r * offset))
        .withColumn("l_partkey", col("l_partkey") + lit(r * offset))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    println(s"""{"scaleup":{"src":"$src","dst":"$dst","k":$k,""" +
      s""""docs":${spark.read.parquet(s"$dst/documents.parquet").count()},""" +
      s""""embeddings":${spark.read.parquet(s"$dst/embeddings.parquet").count()}}}""")
    spark.stop()
  }
}
