package graft

import org.apache.spark.sql.types._

/** Schema-drift canary (VERDICT r10 item 3).
  *
  * The driver regenerated `/root/testdata` mid-round-10 and changed
  * `events.ts` from parquet TIMESTAMP(NANOS) to native timestamp[us],
  * which silently broke 17 graded queries and 20 unit tests through one
  * loader line. This suite pins the loaded dtype of every column of every
  * table so the NEXT regen fails in ONE named test with a message pointing
  * at the loader, instead of 20 cascaded analysis exceptions.
  *
  * Expectations match FIXTURES.md ("Schemas" section, 2026-08-13
  * generation). If a test here fails after a testdata regen: re-probe the
  * parquet (pyarrow), update FIXTURES.md, and adapt `Tables.scala` —
  * `Tables.eventsRaw` is the only loader with generation-specific logic.
  */
class SchemaCanarySuite extends SparkSuite {

  private def dtypes(name: String, df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  private def assertSchema(table: String, df: org.apache.spark.sql.DataFrame,
                           expected: Seq[(String, DataType)]): Unit = {
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toSeq
    assert(actual == expected,
      s"\nSchema drift in table '$table' — testdata was likely regenerated." +
        s"\n  expected: $expected\n  actual:   $actual" +
        s"\nRe-probe /root/testdata, update FIXTURES.md, adapt graft.Tables (Tables.scala).")
  }

  test("canary: region schema") {
    assertSchema("region", Tables.region(spark, sf), Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
  }

  test("canary: nation schema") {
    assertSchema("nation", Tables.nation(spark, sf), Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType))
  }

  test("canary: supplier schema") {
    assertSchema("supplier", Tables.supplier(spark, sf), Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
  }

  test("canary: customer schema") {
    assertSchema("customer", Tables.customer(spark, sf), Seq(
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
  }

  test("canary: part schema") {
    assertSchema("part", Tables.part(spark, sf), Seq(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
  }

  test("canary: orders schema (o_orderdate loads as TIMESTAMP_NTZ)") {
    assertSchema("orders", Tables.orders(spark, sf), Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType))
  }

  test("canary: lineitem schema (l_shipdate loads as TIMESTAMP_NTZ)") {
    assertSchema("lineitem", Tables.lineitem(spark, sf), Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
  }

  test("canary: events schema — loader normalizes ts to TimestampType") {
    // The LOADED contract all 17 events queries depend on: whatever the
    // physical generation (nanos-long or µs-native NTZ), Tables.events
    // must present ts as TimestampType at µs precision.
    assertSchema("events", Tables.events(spark, sf), Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
  }

  test("canary: events raw physical ts dtype is a generation eventsRaw knows") {
    // Read WITHOUT the loader's normalization: a third physical generation
    // (e.g. timestamp[ms], or adjusted-to-UTC) should trip this one test.
    val raw = dtypes("events", Tables.t(spark, sf, "events"))("ts")
    assert(raw == TimestampNTZType || raw == LongType || raw == TimestampType,
      s"events.ts raw dtype $raw is a NEW physical generation — " +
        "teach Tables.eventsRaw (Tables.scala) the new branch and update FIXTURES.md.")
  }

  test("canary: parquet FOOTER physical types — the pre-loader truth (r11 verdict item 7)") {
    // The loaded-dtype pins above see the world AFTER Spark's parquet
    // conversions; a regen that changes the PHYSICAL encoding while
    // landing on the same loaded dtype (µs-NTZ → nanos-long did NOT —
    // that was the r10 break; adjusted-to-UTC or int96 would) should
    // still be diagnosed HERE, with the footer's own words.
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    def footer(table: String): String = {
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$sf/$table.parquet"),
        spark.sparkContext.hadoopConfiguration)
      val r = ParquetFileReader.open(in)
      try r.getFooter.getFileMetaData.getSchema.toString
        .replaceAll("\\s+", " ")
      finally r.close()
    }
    def pin(table: String, fragments: Seq[String]): Unit = {
      val sch = footer(table)
      fragments.foreach(f => assert(sch.contains(f),
        s"\nPhysical-type drift in '$table' footer: expected fragment '$f'" +
          s"\n  footer: $sch" +
          s"\nTestdata regenerated with a new physical encoding — re-probe " +
          s"(pyarrow), update FIXTURES.md, adapt graft.Tables if the loaded " +
          s"dtype shifted (Tables.eventsRaw for events.ts)."))
    }
    // events.ts: THE column whose physical generation broke round 10 —
    // today µs, NOT UTC-adjusted, stored as annotated int64
    pin("events", Seq("int64 ts (TIMESTAMP(MICROS,false))",
      "int64 event_id", "binary event_type (STRING)", "double value"))
    pin("lineitem", Seq("int64 l_shipdate (TIMESTAMP(MICROS,false))",
      "int32 l_linenumber", "double l_quantity", "int64 l_orderkey"))
    pin("orders", Seq("int64 o_orderdate (TIMESTAMP(MICROS,false))",
      "double o_totalprice"))
    pin("documents", Seq("binary text (STRING)", "int64 n_chars"))
    pin("embeddings", Seq("group embedding (LIST)", "float element",
      "int32 label"))
  }

  test("canary: documents schema") {
    assertSchema("documents", Tables.documents(spark, sf), Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
  }

  test("canary: embeddings schema") {
    assertSchema("embeddings", Tables.embeddings(spark, sf), Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
  }

  test("canary: row counts at sf0.001 (FIXTURES.md table)") {
    val expected = Map(
      "region" -> 5L, "nation" -> 25L, "supplier" -> 10L, "customer" -> 150L,
      "part" -> 200L, "orders" -> 1500L, "lineitem" -> 6000L, "events" -> 1000L,
      "documents" -> 500L, "embeddings" -> 500L)
    expected.foreach { case (t, n) =>
      val actual = Tables.t(spark, sf, t).count()
      assert(actual == n,
        s"Row-count drift in '$t' at sf0.001: expected $n, got $actual — " +
          "testdata regenerated with different volumes; re-probe and update FIXTURES.md.")
    }
  }
}
