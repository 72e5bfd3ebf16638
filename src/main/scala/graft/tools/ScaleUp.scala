package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scaling-fixture generator: writes a K×-replicated copy of an
  * sf dir's `documents` / `embeddings` tables — plus, since r15, the
  * whole relational star (lineitem/orders/customer/supplier/part/events
  * with key-offset replicas, bounded dims copied) so the h/w families
  * can be measured at scale too — one decade above the largest
  * driver-provided sf (TESTDATA.md tops out at sf0.1). Usage:
  *
  * {{{ runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <k> [skewPct] }}}
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
  *    original's. The source corpus is asserted to contain no word that
  *    already starts with a replica tag (`r<digits>x…`) — such a word in
  *    replica 0 would collide with a tagged replica word and silently
  *    break the cross-replica-disjointness the K×-true-pairs claim
  *    rests on.
  *  - `skewPct` (default 0): HOT-KEY GROWTH mode. With skewPct = p > 0,
  *    a deterministic p% of the vocabulary (hash-selected per word, so
  *    the same word is shared in every replica — the shape of corpus-wide
  *    boilerplate) is left UNTAGGED in all replicas. A shingle whose two
  *    words are both shared is then identical across replicas and its
  *    document frequency grows ~K× — exactly the axis the pure-tagging
  *    fixture flattens (plain mode keeps per-shingle df constant while
  *    the corpus grows K×, so posting-list salting never faces a K×
  *    hotter key). Skew mode trades the exact K×-true-pairs guarantee
  *    for K×-hotter posting lists: cross-replica candidate pairs now
  *    exist through the hot keys (that is the stress), while verified
  *    near-dup pairs stay dominated by the within-replica structure
  *    because only ~(p/100)² of a doc's shingles are shared.
  *  - `embeddings`: replica r offsets `vec_id` by r·10⁷ and perturbs
  *    each component by a deterministic hash-derived ±0.005 so replica
  *    twins are near but not identical (ANN/KNN/centroid costs stay
  *    honest; exact-duplicate vectors would collapse distance ties).
  *
  * Deterministic end-to-end (hash-based word selection and perturbation,
  * no RNG), so two runs produce byte-identical fixtures.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: graft.tools.ScaleUp <srcSfDir> <dstDir> <k> [skewPct]")
      sys.exit(2)
    }
    val Array(src, dst, kStr) = args.take(3)
    val k = kStr.toInt
    require(k >= 1, s"k must be >= 1, got $k")
    val skewPct = args.lift(3).map(_.toInt).getOrElse(0)
    require(skewPct >= 0 && skewPct <= 100,
      s"skewPct must be in [0, 100], got $skewPct")
    val spark = graft.core.Sessions.local("graft-scaleup",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.core.Sessions.cpus))
    val offset = 10000000L

    val docs = spark.read.parquet(s"$src/documents.parquet")
    // cross-replica-disjointness guard: a source word already shaped like
    // a replica tag ('r1xfoo') in replica 0 would collide with replica
    // 1's tagged 'foo' — one cheap pass before anything is written
    require(docs.filter(col("text").rlike("(^| )r\\d+x")).isEmpty,
      "source corpus contains a word matching the replica tag ^r\\d+x; " +
        "the cross-replica jaccard-0 guarantee would not hold")
    // skew mode: a word is SHARED (left untagged in every replica) when
    // its content hash lands under skewPct — per-word, corpus-global,
    // deterministic. tagWords rewrites text for replica r accordingly.
    def tagWords(r: Int) =
      if (skewPct == 0)
        concat(lit(s"r${r}x"), regexp_replace(col("text"), " ", s" r${r}x"))
      else
        array_join(transform(split(col("text"), " "), w =>
          when(pmod(hash(w), lit(100)) < lit(skewPct), w)
            .otherwise(concat(lit(s"r${r}x"), w))), " ")
    val docReplicas = (0 until k).map { r =>
      if (r == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(r * offset))
        .withColumn("text", tagWords(r))
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

    // lineitem feeds x27's part co-purchase graph AND the h-family
    // multi-join shapes: offset EVERY foreign key per replica
    // (l_orderkey/l_partkey/l_suppkey) so the star grows as K disjoint
    // copies with referential integrity intact against the replicated
    // orders/part/supplier tables below — K× facts joined to K× dims,
    // the shape of real growth, never K× facts fanning into one dim.
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until k).map { r =>
      if (r == 0) li
      else li
        .withColumn("l_orderkey", col("l_orderkey") + lit(r * offset))
        .withColumn("l_partkey", col("l_partkey") + lit(r * offset))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * offset))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    // the rest of the relational star (r15, r14 verdict item 4: the
    // h/w families had no at-scale evidence because only documents/
    // embeddings/lineitem scaled). SF-scaled tables replicate with
    // key offsets; the BOUNDED dims (nation, region) copy as-is — at
    // any corpus scale there are still ~25 nations, which is exactly
    // why their joins stay broadcastable.
    def replicate(table: String, keys: Seq[String]): Unit = {
      val t = spark.read.parquet(s"$src/$table.parquet")
      (0 until k).map { r =>
        if (r == 0) t
        else keys.foldLeft(t)((d, c) =>
          d.withColumn(c, col(c) + lit(r * offset)))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
    }
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    // events: new users and event ids per replica, the SAME time range —
    // K× stream density, which is how a real event table grows (the
    // windowed/sessionized shapes then face K× keys per time window)
    replicate("events", Seq("event_id", "user_id"))
    Seq("nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    println(s"""{"scaleup":{"src":"$src","dst":"$dst","k":$k,""" +
      s""""skew_pct":$skewPct,""" +
      s""""docs":${spark.read.parquet(s"$dst/documents.parquet").count()},""" +
      s""""embeddings":${spark.read.parquet(s"$dst/embeddings.parquet").count()},""" +
      s""""lineitem":${spark.read.parquet(s"$dst/lineitem.parquet").count()},""" +
      s""""events":${spark.read.parquet(s"$dst/events.parquet").count()}}}""")
    spark.stop()
  }
}
