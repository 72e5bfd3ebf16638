package graft.etl

import graft.core.Sessions

/** CLI ≙ reference cli.py — except actually wired to the pipeline (the
  * reference's `run` is a TODO stub, cli.py:18–21; SURVEY §3.1).
  *
  * Usage:
  *   run --month 2025-12 --raw-dir D --curated-dir D --reference-dir D
  *       [--fail-on ERROR|WARN|NEVER] [--star-dir D] [--bi-dir D]
  *   generate --raw-dir D --reference-dir D --month 2025-12 [--seed N]
  *   version
  */
object Cli {
  private val name = "finance-etl-spark"
  private val version = "0.1.0"

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("version") => println(s"$name $version")
    case Some("generate") =>
      val opts = parse(args.tail)
      SampleData.write(opts("raw-dir"), opts("month"),
        opts.getOrElse("seed", "42").toLong)
      SampleData.writeChartOfAccounts(opts("reference-dir"))
      println(s"generated raw month ${opts("month")} under ${opts("raw-dir")}")
    case Some("run") =>
      val opts = parse(args.tail)
      val spark = Sessions.local(name)
      try {
        val out = Pipeline.runMonth(spark, Settings(),
          opts("month"), opts("raw-dir"), opts("curated-dir"), opts("reference-dir"),
          opts.getOrElse("fail-on", FailOn.Error))
        println(s"dq_exceptions=${out.dqExceptions}")
        println(s"dq_summary=${out.dqSummary}")
        println(s"fact=${out.fact}")
        println(s"dim_accounts=${out.dimAccounts}")
        println(s"kpi=${out.kpi}")
        opts.get("star-dir").foreach { dir =>
          StarSchema.export(spark,
            spark.read.parquet(out.fact), spark.read.parquet(out.dimAccounts),
            spark.read.parquet(out.kpi), opts("month"), dir)
          println(s"star=$dir")
        }
        opts.get("bi-dir").foreach { dir =>
          BiExport.export(spark,
            spark.read.parquet(out.fact), spark.read.parquet(out.dimAccounts),
            spark.read.parquet(out.kpi), out.dqExceptions, out.dqSummary,
            opts("month"), dir)
          println(s"bi=$dir")
        }
      } finally spark.stop()
    case _ =>
      System.err.println("usage: run|generate|version (see Scaladoc)")
      sys.exit(2)
  }

  private def parse(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
}
