package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Pins the skew-mitigation contract of x4's inverted-index join: the
  * per-key salt fan-out (nsalt = ceil(df / saltChunk)) changes the plan
  * — how a hot posting list's df² pair-chunks spread over reducers —
  * but NEVER the answer. A tiny chunk forces real fan-out on nearly
  * every key; the result must be bit-identical to the default chunk
  * (where this corpus's keys all get nsalt = 1).
  */
class DedupSaltSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def shingled = graft.corpus.Corpus
    .withShingles(Tables.documents(spark, dir))
    .select(col("doc_id"), col("lang"), col("sh"), size(col("sh")).as("n"))

  test("per-key salting is output-invariant: tiny chunk == default chunk") {
    def pairCounts(chunk: Long): Set[(Long, Long, Long)] = {
      val got = DedupQueries.ngramJaccardCommon(shingled, chunk).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      spark.catalog.clearCache()
      got
    }
    // chunk=2 ⇒ every key with df > 2 joins under nsalt ≥ 2 — the hot
    // path that never engages at this corpus's df under the default
    val salted = pairCounts(2L)
    val default = pairCounts(1024L)
    assert(salted == default)
    assert(salted.nonEmpty)
  }

  test("salting bounds the per-(key, salt) posting volume (chunk=8)") {
    // the balance property behind the fan-out: after salting, no join
    // key carries more than ~chunk postings on the keyed side, so no
    // reducer can receive a df² pair block. (Same nsalt/salt formula as
    // ngramJaccardCommon; pmod spread isn't perfectly uniform → 3× slack.)
    val chunk = 8L
    val postings = shingled.select(col("doc_id"), col("lang"),
      explode(col("sh")).as("shingle"))
    val dfc = postings.groupBy("lang", "shingle").agg(count(lit(1)).as("df"))
    val maxPer = postings.join(dfc, Seq("lang", "shingle"))
      .withColumn("nsalt",
        least(ceil(col("df") / lit(chunk.toDouble)), lit(256L)).cast("int"))
      .withColumn("salt", pmod(col("doc_id"), col("nsalt")))
      .groupBy("lang", "shingle", "salt").count()
      .agg(max("count")).first().getLong(0)
    assert(maxPer <= 3 * chunk,
      s"hot key not spread: max per-(key, salt) posting volume $maxPer")
  }

  test("the tiny chunk really engages the fan-out (corpus has df > 2 keys)") {
    val maxDf = shingled
      .select(col("lang"), explode(col("sh")).as("shingle"))
      .groupBy("lang", "shingle").count()
      .agg(max("count")).first().getLong(0)
    assert(maxDf > 2, s"corpus too small to exercise salting (max df $maxDf)")
  }
}
