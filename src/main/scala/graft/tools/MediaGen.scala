package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only MEDIA fixture generator (r15 verdict item 4): the
  * text-bytes-as-media fixtures made aHash-48 pseudo-collide at a rate
  * that grew with corpus size (low-variance ASCII → thresholded bit
  * patterns repeat), so the recall ladder's ABSOLUTE numbers reflected
  * the hash model on synthetic text, not duplicate structure. This
  * writes a `documents`-shaped table whose payloads have FULL byte
  * variance (splitmix64-seeded printable bytes 33..126 — single-byte
  * codepoints so the DuckDB oracle's ascii(substr(...)) arithmetic
  * still holds) and PLANTED duplicate structure with closed-form
  * expectations, so measured recall is checkable against analytic
  * truth instead of footnoted.
  *
  * Layout under the m3 geometry (32×2, stride 2 → sampled frames are
  * the 64-byte blocks at 128-byte offsets; every payload carries
  * exactly 5 sampled frames, 576 bytes):
  *
  *  - POPULAR clusters: the first ⌊M/6400⌋·128 ids form clusters of
  *    128 consecutive members sharing TWO signature frames
  *    (df = 128 — past the rep cap 64, under the truth bound: the
  *    population the strict cap is blind to and the bounded rule keeps
  *    through its 64 lowest-id representatives);
  *  - NORMAL clusters: the next 30% of ids in groups of 8; the first
  *    2 + (c mod 4) members of group c share two signature frames
  *    (df ≤ 5 — both rules keep these), the rest are singletons;
  *  - SINGLETONS: everything else — all five frames unique;
  *  - BOILERPLATE: singleton ids ≡ 0 (mod 33) (~2% of the corpus)
  *    replace one frame with ONE global intro-card frame, so its df rides
  *    corpus size across the truth bound exactly like real boilerplate
  *    (df ≈ 0.03·M: between the caps at the small rungs, evicted past
  *    4096 at the big ones). One shared hash alone never makes a pair
  *    (the ≥2 rule), so it adds no truth pairs at any M.
  *
  * Analytic truth (printed on generation): truth pairs =
  * nPop·C(128,2) + Σ_groups C(m,2); strict-cap recall =
  * normal/(normal+popular); bounded pair recall =
  * (normal + popular·(1 − C(64,2)/C(128,2)))/(normal+popular)
  * (a popular pair survives iff its lower id is among the hash's 64
  * lowest holders) with keeper agreement 1.0 (every cluster minimum is
  * a representative of every hash it holds). Collisions should now be
  * the residual between measured and analytic — the number the old
  * fixture could not expose.
  *
  * Usage: runMain graft.tools.MediaGen <dstDir> <mediaCount>
  */
object MediaGen {
  private val FRAME = 64
  private val STRIDE = 128
  private val FRAMES = 5
  private val LEN = STRIDE * (FRAMES - 1) + FRAME // 576
  private val POP_M = 128
  private val GROUP = 8

  /** splitmix64 — public-domain PRNG step (Steele et al.), the
    * deterministic full-variance byte source.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** one 128-byte stride of printable bytes seeded by (tag, idx) — the
    * first 64 are a sampled frame, the rest inter-frame filler.
    */
  private def stride(tag: Long, idx: Long, out: StringBuilder,
      len: Int): Unit = {
    var produced = 0
    var ctr = 0L
    while (produced < len) {
      var word = mix(mix(tag) ^ mix(idx) ^ ctr)
      var b = 0
      while (b < 8 && produced < len) {
        out.append((33 + java.lang.Long.remainderUnsigned(word, 94L)).toChar)
        word = word >>> 8
        produced += 1
        b += 1
      }
      ctr += 1
    }
  }

  /** the planted cluster signature of id, or None for singletons. */
  private[tools] def sigOf(id: Long, m: Long): Option[Long] = {
    val nPopClusters = m / 6400
    val popIds = nPopClusters * POP_M
    val normalIds = (m * 3) / 10
    if (id < popIds) Some(id / POP_M) // popular cluster index
    else if (id < popIds + normalIds) {
      val g = (id - popIds) / GROUP
      val within = (id - popIds) % GROUP
      val dupN = 2 + (g % 4)
      if (within < dupN) Some(1000000000L + g) else None
    } else None
  }

  /** intro-card boilerplate rides SINGLETONS only, so the planted
    * cluster analytics stay exactly closed-form (an intro hash under
    * the truth bound would otherwise open a small extra candidate path
    * into popular clusters and turn the expectation into a bound).
    */
  private[tools] def introOf(id: Long, m: Long): Boolean =
    id % 33 == 0 && sigOf(id, m).isEmpty

  private[tools] def payload(id: Long, m: Long): String = {
    val sig = sigOf(id, m)
    val intro = introOf(id, m)
    val sb = new StringBuilder(LEN)
    var f = 0
    while (f < FRAMES) {
      val last = f == FRAMES - 1
      val len = if (last) FRAME else STRIDE
      (f, sig) match {
        case (0, Some(c)) => stride(-1L - c, 0L, sb, len)
        case (2, Some(c)) => stride(-1L - c, 2L, sb, len)
        case (1, _) if intro => stride(Long.MinValue, 1L, sb, len)
        case _ => stride(id, f.toLong, sb, len)
      }
      f += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val dst = args(0)
    val m = args(1).toLong
    val spark = graft.core.Sessions.local("media-gen",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.core.Sessions.cpus))
    import spark.implicits._
    val mb = m
    spark.range(0, m, 1, 32)
      .map { id => (id, payload(id, mb), "xx", "mediagen", LEN.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    // analytic truth, printed for the ladder record
    val nPop = m / 6400
    val popPairs = nPop * (POP_M.toLong * (POP_M - 1) / 2)
    val groups = (m * 3) / 10 / GROUP
    var normalPairs = 0L
    var g = 0L
    while (g < groups) {
      val d = 2 + (g % 4); normalPairs += d * (d - 1) / 2; g += 1
    }
    val total = popPairs + normalPairs
    val keptPop = POP_M.toLong * (POP_M - 1) / 2 - 64L * 63 / 2
    val bounded = normalPairs + nPop * keptPop
    val introDf = (0L until m).count(id => introOf(id, m))
    println(s"""{"mediagen":{"dst":"$dst","media":$m,""" +
      s""""pop_clusters":$nPop,"truth_pairs":$total,""" +
      s""""expect_strict_recall":${if (total == 0) 1.0
        else normalPairs.toDouble / total},""" +
      s""""expect_bounded_recall":${if (total == 0) 1.0
        else bounded.toDouble / total},""" +
      s""""intro_df":$introDf}}""")
    spark.stop()
  }
}
