package graft.core

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Loud, readable canary for driver-side testdata drift.
  *
  * The driver regenerates `/root/testdata` between rounds, and silent
  * schema drift there has already cost a round (events.ts encoding flip,
  * round 6: seven queries crashed out of the correctness record). This
  * spec pins the COLUMN CONTRACT of all ten tables — names, order, and
  * the Spark-visible type — so the next drift fails HERE at `sbt test`
  * time with a message naming the table and column, instead of as a
  * scatter of DATATYPE_MISMATCH crashes deep inside query plans.
  *
  * `events.ts` is intentionally allowed ANY of its three historical
  * physical encodings (ns-long / µs-LTZ / µs-NTZ); what is pinned is that
  * [[Tables.eventsTs]] normalizes it to TimestampType (the contract every
  * query relies on — EventTsEncodingSpec pins value-equality separately).
  */
class TestdataContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // the engine's required view of each table: (column, acceptable types).
  // Acceptable = what the query surface genuinely tolerates; widths we
  // never depend on (int32 vs int64 keys) list both so a benign driver
  // re-width doesn't cry wolf.
  private def i32i64 = Seq(IntegerType, LongType)
  private val contract: Map[String, Seq[(String, Seq[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> i32i64, "r_name" -> Seq(StringType)),
    "nation" -> Seq("n_nationkey" -> i32i64, "n_name" -> Seq(StringType),
      "n_regionkey" -> i32i64),
    "customer" -> Seq("c_custkey" -> i32i64, "c_name" -> Seq(StringType),
      "c_nationkey" -> i32i64, "c_acctbal" -> Seq(DoubleType),
      "c_mktsegment" -> Seq(StringType)),
    "supplier" -> Seq("s_suppkey" -> i32i64, "s_name" -> Seq(StringType),
      "s_nationkey" -> i32i64, "s_acctbal" -> Seq(DoubleType)),
    "part" -> Seq("p_partkey" -> i32i64, "p_name" -> Seq(StringType),
      "p_brand" -> Seq(StringType), "p_type" -> Seq(StringType),
      "p_size" -> i32i64, "p_retailprice" -> Seq(DoubleType)),
    "orders" -> Seq("o_orderkey" -> i32i64, "o_custkey" -> i32i64,
      "o_orderstatus" -> Seq(StringType), "o_totalprice" -> Seq(DoubleType),
      "o_orderdate" -> Seq(TimestampType, TimestampNTZType, DateType),
      "o_orderpriority" -> Seq(StringType)),
    "lineitem" -> Seq("l_orderkey" -> i32i64, "l_partkey" -> i32i64,
      "l_suppkey" -> i32i64, "l_linenumber" -> i32i64,
      "l_quantity" -> Seq(DoubleType), "l_extendedprice" -> Seq(DoubleType),
      "l_discount" -> Seq(DoubleType), "l_tax" -> Seq(DoubleType),
      "l_returnflag" -> Seq(StringType), "l_linestatus" -> Seq(StringType),
      "l_shipdate" -> Seq(TimestampType, TimestampNTZType, DateType)),
    "events" -> Seq("event_id" -> i32i64,
      // all three historical encodings tolerated; normalization pinned below
      "ts" -> Seq(TimestampType, TimestampNTZType, LongType),
      "user_id" -> i32i64, "event_type" -> Seq(StringType),
      "value" -> Seq(DoubleType), "props" -> Seq(StringType)),
    "documents" -> Seq("doc_id" -> i32i64, "text" -> Seq(StringType),
      "lang" -> Seq(StringType), "source" -> Seq(StringType),
      "n_chars" -> i32i64),
    "embeddings" -> Seq("vec_id" -> i32i64,
      "embedding" -> Seq(ArrayType(FloatType), ArrayType(FloatType, containsNull = true),
        ArrayType(DoubleType), ArrayType(DoubleType, containsNull = true)),
      "label" -> i32i64))

  test("all ten tables match the engine's column contract (names, order, types)") {
    val problems = Tables.names.flatMap { t =>
      val expected = contract(t)
      val actual = Tables.load(spark, dir, t).schema.fields
      val nameDiff =
        if (actual.map(_.name).toSeq != expected.map(_._1))
          Seq(s"$t: columns changed — expected ${expected.map(_._1).mkString(",")}, " +
            s"got ${actual.map(_.name).mkString(",")}")
        else Nil
      val typeDiff =
        if (nameDiff.nonEmpty) Nil
        else expected.zip(actual).collect {
          case ((name, ok), f) if !ok.contains(f.dataType) =>
            s"$t.$name: type ${f.dataType.simpleString} not in tolerated " +
              s"set {${ok.map(_.simpleString).mkString(", ")}} — driver testdata " +
              "drifted; widen the contract here ONLY after confirming every " +
              "consumer handles it (see round 6's events.ts lesson)"
        }
      nameDiff ++ typeDiff
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("every table is non-empty at every sf") {
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      Tables.names.foreach { t =>
        val n = Tables.load(spark, s"/root/testdata/$sf", t).limit(1).count()
        assert(n == 1L, s"$sf/$t is empty or unreadable")
      }
    }
  }

  test("eventsTs normalizes to TimestampType regardless of the physical encoding") {
    assert(Tables.eventsTs(spark, dir).schema("ts").dataType == TimestampType)
  }
}
