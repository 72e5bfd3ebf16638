package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Smoke coverage for the user-facing CLI — every subcommand a reference
  * user would type, driven end-to-end in one JVM. Relies on the session-
  * ownership contract: `Cli.main` must NOT stop a session it did not
  * create (this suite's shared session must survive every call).
  */
class CliSpec extends SparkSpec {

  private def run(args: String*): Unit = Cli.main(args.toArray)

  test("generate then run produce the pipeline outputs, and the session survives") {
    val base = tmpDir("cli_spec")
    run("generate", "--raw-dir", s"$base/raw", "--reference-dir", s"$base/ref",
      "--month", "2025-12")
    run("run", "--month", "2025-12", "--raw-dir", s"$base/raw",
      "--curated-dir", s"$base/curated", "--reference-dir", s"$base/ref",
      "--star-dir", s"$base/star", "--bi-dir", s"$base/bi",
      "--dashboard", s"$base/dash.html")
    // the shared session must still be alive and usable
    assert(!spark.sparkContext.isStopped)
    assert(spark.read.parquet(s"$base/curated/fact_transactions.parquet").count() > 0)
    assert(new java.io.File(s"$base/star/fact_gl.csv").exists())
    assert(new java.io.File(s"$base/dash.html").exists())
  }

  test("curate, index, curate-inc, and ann-index compose on the shipped corpus") {
    val base = tmpDir("cli_corpus")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$base/docs_a")
    docs.filter(col("doc_id") % 2 =!= 0).write.parquet(s"$base/docs_b")

    run("curate", "--documents", s"$base/docs_a", "--out", s"$base/curated")
    assert(spark.read.parquet(s"$base/curated").count() > 0)

    run("index", "--documents", s"$base/docs_a", "--out", s"$base/seg0")
    run("curate-inc", "--documents", s"$base/docs_b", "--index", s"$base/seg0",
      "--append-segment", s"$base/seg1", "--out", s"$base/curated_b")
    assert(spark.read.parquet(s"$base/curated_b").count() > 0)
    assert(new java.io.File(s"$base/seg1/signatures").exists())

    graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .write.parquet(s"$base/emb")
    run("ann-index", "--embeddings", s"$base/emb", "--out", s"$base/ann")
    assert(new java.io.File(s"$base/ann/centroids").exists())
    assert(!spark.sparkContext.isStopped)
  }

  test("version prints without touching Spark") {
    // (the unknown-subcommand path calls sys.exit and is deliberately
    // not driven here — it would terminate the forked test JVM)
    run("version")
    assert(!spark.sparkContext.isStopped)
  }
}
