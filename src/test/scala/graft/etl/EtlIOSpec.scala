package graft.etl

import graft.SparkSpec

class EtlIOSpec extends SparkSpec {

  test("csvHeader parses quoted fields with embedded commas and escaped quotes") {
    val p = s"${tmpDir("etlio")}/h.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "a,\"b, with comma\",\"c \"\"q\"\"\",d\n1,2,3,4\n")
    assert(EtlIO.csvHeader(p) == Seq("a", "b, with comma", "c \"q\"", "d"))
  }

  test("csvHeader on a plain header is unchanged") {
    val p = s"${tmpDir("etlio")}/plain.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "date,entity,amount\n2025-12-01,TLM,1\n")
    assert(EtlIO.csvHeader(p) == Seq("date", "entity", "amount"))
  }

  test("a quoted comma-bearing header binds columns by name without phantoms") {
    val p = s"${tmpDir("etlio")}/q.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "entity,\"note, detail\"\nTLM,hello\n")
    val df = EtlIO.readCsvRaw(spark, p,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("entity",
          org.apache.spark.sql.types.StringType))))
    assert(df.columns.toSeq == Seq("entity"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("TLM"))
  }
}
