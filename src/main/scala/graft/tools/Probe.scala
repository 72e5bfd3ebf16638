package graft.tools

import graft.core.Sessions

/** Dev probe — kept out of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("probe")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.show(3, truncate = false)
    } catch {
      case e: Throwable => println(s"EVENTS READ FAILED: ${e.getMessage}")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.printSchema()
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.printSchema()
    spark.stop()
  }
}
