package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg (dev use): comma-separated query names — dump
    // only those. The driver always calls with two args = full dump.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = graft.core.Sessions.local("graft-verify",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    val attempted = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    attempted.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Manifest of every query this dump ATTEMPTED plus the ones that
    // crashed. A crashed query writes no parquet, so without this a
    // result-set shrink reads as "all green" (round 6 lost 7 queries
    // silently: 145/148 looked healthier than 150/155). selfcheck.py
    // cross-references this and fails loudly on any absent name.
    def arr(names: Iterable[String]) =
      names.toSeq.sorted.map(q).mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/manifest.json"),
      s"""{"attempted":${arr(attempted.keys)},"failed":${arr(failed)}}""")
    // Loud but exit-0: a non-zero exit might make the driver discard the
    // healthy dumps too. Hard failure lives in tools/selfcheck.py.
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size}/${attempted.size} queries FAILED: ${failed.sorted.mkString(", ")}")
    spark.stop()
  }
}
