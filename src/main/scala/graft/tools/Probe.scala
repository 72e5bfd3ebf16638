package graft.tools

import graft.core.Sessions

/** Dev probe — kept out of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("probe", "4")
    import org.apache.spark.sql.functions._
    // 1) does Observation fire on localCheckpoint? (guard with a timeout
    //    thread so a hang is visible instead of eternal)
    val obs = org.apache.spark.sql.Observation()
    val df = spark.range(0, 1000).withColumn("chg", (col("id") % 3 === 0).cast("long"))
      .observe(obs, sum(col("chg")).as("changed"))
      .localCheckpoint()
    val t = new Thread(() => {
      Thread.sleep(15000)
      println("OBS TIMEOUT — metrics never arrived"); System.out.flush()
      Runtime.getRuntime.halt(2)
    })
    t.setDaemon(true); t.start()
    println(s"OBS RESULT: ${obs.get("changed")} (expect 334)")
    println(s"CHECKPOINTED COUNT: ${df.count()}")
    // 2) dupClusters on sf0.001 end-to-end with the new shape
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val t0 = System.nanoTime()
    val n = graft.corpus.Corpus.dupClusters(docs).count()
    println(f"DUPCLUSTERS ROWS: $n, time ${(System.nanoTime()-t0)/1e9}%.2f s")
    // 3) vanilla-session check: nearDupPairs without GraftExtensions
    val vanilla = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("vanilla")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    println("VANILLA PAIRS: " + graft.corpus.Corpus.nearDupPairs(
      vanilla.read.parquet("/root/testdata/sf0.001/documents.parquet")).count())
    spark.stop()
  }
}
