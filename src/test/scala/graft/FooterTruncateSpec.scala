package graft

import java.nio.file.{Files, Paths}

import graft.parse.Strict
import graft.schema.FixedSchema
import graft.sources.FixedWidth

/** Fine print F6: the reference ends the whole chunk at the first footer
  * line (`fixed2avro/ColumnBuilder.go:211-214` breaks the scan loop), so
  * data AFTER a mid-chunk footer is silently skipped. The default read
  * keeps the documented filter deviation; `readTruncateAtFooter` is the
  * strict parity mode. */
class FooterTruncateSpec extends SparkSpec {

  // name(4 runes string) + qty(4 runes int)
  private val json =
    """{"type":"record","name":"t","fields":[
      |{"name":"name","type":{"type":"string","name":"name","len":4}},
      |{"name":"qty","type":{"type":"int","name":"qty","len":4}}
      |]}""".stripMargin
  private val fixed = FixedSchema.fromJson(json)

  private def fixture(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-footer").toString
    Files.write(Paths.get(dir, "part-00000.txt"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    dir
  }

  test("strict parity mode truncates from the first footer; default filter keeps parsing") {
    val dir = fixture(Seq(
      "aaaa   1",
      "************* ignored footer payload", // > 12 asterisks → footer
      "bbbb   2",
      "cccc   3"))
    val strict = FixedWidth.readTruncateAtFooter(spark, dir, fixed, Strict)
      .collect().map(_.getString(0).trim).sorted
    assert(strict.toSeq == Seq("aaaa"),
      "reference semantics: everything after a mid-chunk footer is skipped")
    val filtered = FixedWidth.read(spark, dir, fixed, Strict)
      .collect().map(_.getString(0).trim).sorted
    assert(filtered.toSeq == Seq("aaaa", "bbbb", "cccc"),
      "default filter semantics: footer dropped, later lines kept")
  }

  test("a line of EXACTLY 12 asterisks is data, not a footer (len > 12 in the reference)") {
    val dir = fixture(Seq(
      "aaaa   1",
      "************", // len == 12 → NOT a footer per ColumnBuilder.go:211
      "bbbb   2"))
    val strict = FixedWidth.readTruncateAtFooter(spark, dir, fixed, Strict)
    // 12-asterisk line is short for this 8-rune schema → best-effort row;
    // the point is that parsing CONTINUES past it.
    val names = strict.collect().map(_.getString(0)).toSeq
    assert(names.exists(_ == "aaaa") && names.exists(_ == "bbbb"))
    assert(names.length == 3)
    // The DEFAULT filter applies the same strictly-greater test: the
    // 12-star line must be KEPT as (malformed) data, not dropped.
    val filtered = FixedWidth.read(spark, dir, fixed, Strict)
      .collect().map(_.getString(0)).toSeq
    assert(filtered.length == 3,
      s"default filter must keep the exactly-12-asterisk data line: $filtered")
    // A 13-asterisk line IS a footer for both modes.
    val dir13 = fixture(Seq("aaaa   1", "*************", "bbbb   2"))
    assert(FixedWidth.read(spark, dir13, fixed, Strict).count() == 2)
    assert(FixedWidth.readTruncateAtFooter(spark, dir13, fixed, Strict).count() == 1)
  }

  test("footer filter physical plan: StartsWith short-circuits before an O(1) length test") {
    // The r9 regression: `length()` (a full per-row codepoint walk) as
    // the LEFT conjunct ran on every row, +0.20-0.24 s/GB on all parse
    // legs. Pin the fixed shape — in the physical Filter the 12-byte
    // StartsWith must come first, and the residual length test must be
    // O(1) octet_length, never the codepoint-walking `length`.
    val dir = fixture(Seq("aaaa   1"))
    val df = FixedWidth.read(spark, dir, fixed, Strict)
    val filterLines = df.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("Filter")).toSeq
    val footer = filterLines.filter(_.contains("StartsWith"))
    assert(footer.nonEmpty, s"no footer Filter in plan: $filterLines")
    footer.foreach { f =>
      val sw = f.indexOf("StartsWith")
      val ol = f.indexOf("octet_length")
      assert(ol >= 0, s"footer filter must use O(1) octet_length: $f")
      assert(sw < ol, s"StartsWith must evaluate before the length test: $f")
      assert(!f.replace("octet_length", "OL").contains("length("),
        s"codepoint-walking length() is back in the hot footer filter: $f")
    }
  }

  test("streaming strict parity ≡ batch strict parity (mid-file footer truncates)") {
    val dir = fixture(Seq(
      "aaaa   1",
      "************* ignored footer payload",
      "bbbb   2"))
    val out = java.nio.file.Files.createTempDirectory("graft-footer-out").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-footer-ck").toString
    val stream = graft.streaming.FixedWidthStream
      .parseStreamTruncateAtFooter(spark, dir, fixed, Strict)
    assert(stream.isStreaming)
    graft.streaming.FixedWidthStream.runToParquet(stream, out, ck)
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getString(0).trim, r.getInt(1))).sorted.toSeq
    val batch = FixedWidth.readTruncateAtFooter(spark, dir, fixed, Strict).collect()
      .map(r => (r.getString(0).trim, r.getInt(1))).sorted.toSeq
    assert(streamed == batch && streamed == Seq(("aaaa", 1)),
      s"streaming F6 parity drifted from batch: $streamed vs $batch")
  }

  test("multi-file dir at one-file-per-split: footer truncates only its own file, streaming ≡ batch") {
    // Batch FilePartition packing can place several SMALL files in one
    // partition (each costs size + openCostInBytes, default 4 MB, against
    // a 128 MB bin) — a footer in the first-read file would then truncate
    // the whole partition, files behind it included, while streaming that
    // ingests the files in separate splits keeps them. Pin the conf that
    // restores per-file chunks (openCost = bin size → one file per split)
    // and assert the two modes agree on it.
    val dir = Files.createTempDirectory("graft-footer-multi").toString
    Files.write(Paths.get(dir, "f0.txt"),
      Seq("aaaa   1", "************* trailer", "bbbb   2")
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    Files.write(Paths.get(dir, "f1.txt"),
      Seq("cccc   3", "dddd   4").mkString("", "\n", "\n").getBytes("UTF-8"))
    val key = "spark.sql.files.openCostInBytes"
    val prev = spark.conf.get(key)
    // The one-file-per-split recipe (FixedWidthStream.scala doc) is
    // openCost = maxPartitionBytes — read the ACTUAL bin size rather
    // than hardcoding the 128 MB default, so the guarantee holds even
    // if the suite session runs with a non-default maxPartitionBytes.
    spark.conf.set(key, spark.conf.get("spark.sql.files.maxPartitionBytes"))
    try {
      val batch = FixedWidth.readTruncateAtFooter(spark, dir, fixed, Strict)
        .collect().map(r => (r.getString(0).trim, r.getInt(1))).sorted.toSeq
      assert(batch == Seq(("aaaa", 1), ("cccc", 3), ("dddd", 4)),
        s"footer in f0 must not swallow f1: $batch")
      val out = Files.createTempDirectory("graft-footer-mout").toString
      val ck = Files.createTempDirectory("graft-footer-mck").toString
      val stream = graft.streaming.FixedWidthStream
        .parseStreamTruncateAtFooter(spark, dir, fixed, Strict)
      graft.streaming.FixedWidthStream.runToParquet(stream, out, ck)
      val streamed = spark.read.parquet(out).collect()
        .map(r => (r.getString(0).trim, r.getInt(1))).sorted.toSeq
      assert(streamed == batch,
        s"streaming multi-file F6 parity drifted from batch: $streamed vs $batch")
    } finally spark.conf.set(key, prev)
  }

  test("footer truncates per FILE even when packing puts another file behind it in one partition") {
    // r17 regression guard: before the per-file dropping flag, the
    // parity mode's takeWhile was per packed PARTITION — with the
    // default openCostInBytes both small files bin-pack together
    // (size-descending, so the larger footer file reads FIRST) and
    // f0's footer silently swallowed every row of f1. Here the packing
    // is forced (openCost 0, one bin) so this test fails loudly if the
    // per-file reset ever regresses to partition-wide truncation.
    val dir = Files.createTempDirectory("graft-footer-packed").toString
    Files.write(Paths.get(dir, "f0.txt"),
      Seq("aaaa   1", "************* trailer", "bbbb   2", "eeee   5")
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    Files.write(Paths.get(dir, "f1.txt"),
      Seq("cccc   3", "dddd   4").mkString("", "\n", "\n").getBytes("UTF-8"))
    val costKey = "spark.sql.files.openCostInBytes"
    val minKey = "spark.sql.files.minPartitionNum"
    val prevCost = spark.conf.get(costKey)
    val prevMin = spark.conf.getOption(minKey)
    spark.conf.set(costKey, "0")
    spark.conf.set(minKey, "1")
    try {
      val lines = spark.read.textFile(dir)
      assert(lines.rdd.getNumPartitions == 1,
        "fixture must pack both files into ONE partition to exercise the regression")
      val batch = FixedWidth.readTruncateAtFooter(spark, dir, fixed, Strict)
        .collect().map(r => (r.getString(0).trim, r.getInt(1))).sorted.toSeq
      assert(batch == Seq(("aaaa", 1), ("cccc", 3), ("dddd", 4)),
        s"f0's footer must truncate f0 only — f1 packed behind it survives: $batch")
    } finally {
      spark.conf.set(costKey, prevCost)
      prevMin match {
        case Some(v) => spark.conf.set(minKey, v)
        case None => spark.conf.unset(minKey)
      }
    }
  }

  test("footer as last line: strict parity and default filter agree (the normal feed)") {
    val dir = fixture(Seq("aaaa   1", "bbbb   2", "************* trailer"))
    val strict = FixedWidth.readTruncateAtFooter(spark, dir, fixed, Strict)
      .collect().map(r => (r.getString(0).trim, r.getInt(1))).sorted.toSeq
    val filtered = FixedWidth.read(spark, dir, fixed, Strict)
      .collect().map(r => (r.getString(0).trim, r.getInt(1))).sorted.toSeq
    assert(strict == filtered && strict == Seq(("aaaa", 1), ("bbbb", 2)))
  }
}
