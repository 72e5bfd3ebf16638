package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Dev tool: time selected queries (count() action) at SPARK_GRAFT_SF_DIR.
  * Usage: runMain graft.tools.TimeQuery [queryName ...]   (default: all)
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("time-query",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // session warm-up so the first query doesn't absorb init costs
    graft.core.Tables.names.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = try SparkEntry.queries(n)(spark, dir).count()
                 catch { case e: Throwable => println(s"$n FAILED: $e"); -1L }
      spark.catalog.clearCache()
      println(f"TIME $n%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
    }
    spark.stop()
  }
}
