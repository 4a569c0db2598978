package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkTestBase {

  val sf = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("asMedia schema contract: binary payload + typed metadata struct") {
    val m = Multimodal.asMedia(docs)
    assert(m.schema("payload").dataType === BinaryType)
    val meta = m.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta("mime").dataType === StringType)
    assert(meta("n_bytes").dataType === IntegerType)
  }

  test("sampleFrames cuts frameBytes chunks and keeps every stride-th") {
    import spark.implicits._
    // 300 bytes -> frames of 100 at offsets 0,100,200; stride 2 keeps 0,200
    val payload = Array.tabulate(300)(_.toByte)
    val df = Seq((1L, payload), (2L, Array.empty[Byte])).toDF("id", "payload")
    val out = df.select(col("id"),
      Multimodal.sampleFrames(col("payload"), 100, 2).as("fr"))
      .orderBy("id").as[(Long, Seq[Array[Byte]])].collect()
    assert(out(0)._2.length === 2)
    assert(out(0)._2(0).toSeq === payload.slice(0, 100).toSeq)
    assert(out(0)._2(1).toSeq === payload.slice(200, 300).toSeq)
    assert(out(1)._2.isEmpty) // empty payload -> zero frames, no descend
  }

  test("sampleFrames stride-1 frames reassemble the original payload") {
    import spark.implicits._
    // lengths chosen to cover exact-multiple and ragged-tail cases
    val payloads = Seq(0, 1, 63, 64, 65, 200).map(n =>
      Array.tabulate(n)(i => (i * 7 + n).toByte))
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")
    val out = df.select(col("id"), col("payload"),
      Multimodal.sampleFrames(col("payload"), 64, 1).as("fr"))
      .orderBy("id").as[(Long, Array[Byte], Seq[Array[Byte]])].collect()
    out.foreach { case (_, payload, frames) =>
      assert(frames.flatten.toSeq === payload.toSeq)
    }
  }

  test("decodeStub: deterministic, 4-float features, preserves rows") {
    val media = Multimodal.asMedia(docs)
    val f1 = Multimodal.decodeStub(spark, media).collect()
      .sortBy(_.doc_id)
    val f2 = Multimodal.decodeStub(spark, media).collect()
      .sortBy(_.doc_id)
    assert(f1.length === docs.count())
    assert(f1.forall(_.features.length === 4))
    assert(f1.forall(_.features.forall(v => v >= 0f && v <= 1f)))
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
  }

  test("decodeStub survives repartitioning (partition-local batching)") {
    val media = Multimodal.asMedia(docs).repartition(7)
    val feats = Multimodal.decodeStub(spark, media, batchSize = 5)
      .select(col("doc_id"), element_at(col("features"), 1).as("f0"))
      .orderBy("doc_id").collect()
    val single = Multimodal.decodeStub(spark, Multimodal.asMedia(docs).coalesce(1))
      .select(col("doc_id"), element_at(col("features"), 1).as("f0"))
      .orderBy("doc_id").collect()
    assert(feats.toSeq === single.toSeq, "features must not depend on partitioning")
  }

  test("aHash: identical payloads collide, small edits stay near") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val edited = base.replace("lazy", "hazy") // one small local change
    val noise = (1 to 400).map(i => s"xQ$i%zk").mkString("#")
    val df = Seq((1L, base), (2L, base), (3L, edited), (4L, noise), (5L, ""))
      .toDF("doc_id", "text")
    val bands = Multimodal.aHash(df, "text").select("doc_id", "bands")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def hamming(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(bands(1L) === bands(2L), "identical text must hash identically")
    assert(hamming(bands(1L), bands(3L)) <= 6,
      s"one-word edit drifted ${hamming(bands(1L), bands(3L))} bits")
    assert(hamming(bands(1L), bands(4L)) > 6,
      "unrelated text should not be a near-dup")
    assert(bands(5L) === Seq(0L, 0L, 0L, 0L), "empty payload -> zero hash")
    assert(bands.values.forall(_.forall(v => v >= 0L && v < 65536L)),
      "bands must be 16-bit values")
  }

  test("aHash intensity is the CODEPOINT (DuckDB ascii parity), not the lead byte") {
    import spark.implicits._
    // é = U+00E9: codepoint 233; its UTF-8 lead byte is 0xC3 (195) and
    // would differ. An all-é payload has every segment mean == global
    // mean -> all bits 0, same as an all-'a' payload; a payload whose
    // second half is é (233 > mean) must set exactly the upper 32 bits
    val df = Seq(
      (1L, "a" * 128), (2L, "é" * 128), (3L, ("a" * 64) + ("é" * 64))
    ).toDF("doc_id", "text")
    val bands = Multimodal.aHash(df, "text").select("doc_id", "bands")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(bands(1L) === Seq(0L, 0L, 0L, 0L))
    assert(bands(2L) === Seq(0L, 0L, 0L, 0L))
    assert(bands(3L) === Seq(0L, 0L, 65535L, 65535L),
      "second half above mean -> bits 32..63 set")
  }

  // ---- PgmAHashBands: REAL decode path ----

  private def pgm(w: Int, h: Int, px: Array[Byte],
      header: String = null): Array[Byte] = {
    val hdr = Option(header).getOrElse(s"P5\n$w $h\n255\n")
    hdr.getBytes("UTF-8") ++ px
  }

  private def decodeBands(payloads: Seq[Array[Byte]]): Map[Long, Option[Seq[Long]]] = {
    import spark.implicits._
    payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")
      .select(col("id"), Multimodal.pgmAHash(col("payload")).as("bands"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1)))).toMap
  }

  test("pgmAHash decodes real pixels: top-dark bottom-bright 8x8") {
    // rows 0-3 = 0, rows 4-7 = 200 -> global mean 100: bits 0..31
    // clear, bits 32..63 set (bands 0,1 = 0; bands 2,3 = 0xFFFF)
    val px = Array.fill(32)(0.toByte) ++ Array.fill(32)(200.toByte)
    val out = decodeBands(Seq(pgm(8, 8, px)))
    assert(out(0L) === Some(Seq(0L, 0L, 65535L, 65535L)))
  }

  test("pgmAHash pooling is resolution-independent (8x8 vs 16x16 scene)") {
    val small = Array.fill(32)(10.toByte) ++ Array.fill(32)(240.toByte)
    // the same scene at 16x16: each 8x8 cell is a 2x2 pixel block
    val big = Array.fill(128)(10.toByte) ++ Array.fill(128)(240.toByte)
    val out = decodeBands(Seq(pgm(8, 8, small), pgm(16, 16, big)))
    assert(out(0L) === out(1L), "pooled grids must match across resolutions")
  }

  test("pgmAHash parses comments, whitespace runs, and maxval < 255") {
    val px = Array.fill(32)(0.toByte) ++ Array.fill(32)(99.toByte)
    val canonical = pgm(8, 8, px)
    val fancy = pgm(8, 8, px,
      header = "P5 # magic\n# a comment line\n  8\t8\n# another\n100\n")
    val out = decodeBands(Seq(canonical, fancy))
    assert(out(0L).isDefined && out(0L) === out(1L),
      "comment/whitespace/maxval variants must decode to the same hash")
  }

  test("pgmAHash returns null on malformed payloads, not an error") {
    val px64 = Array.fill(64)(50.toByte)
    val cases = Seq(
      "P6\n8 8\n255\n".getBytes("UTF-8") ++ px64, // wrong magic (PPM)
      pgm(8, 8, Array.fill(40)(1.toByte)), // truncated raster
      "P5\n8 8\n65535\n".getBytes("UTF-8") ++ px64, // 2-byte samples
      "P5\n0 8\n255\n".getBytes("UTF-8"), // zero dim
      "P5\n999999999 999999999\n255\n".getBytes("UTF-8"), // lying dims
      Array.empty[Byte])
    val out = decodeBands(cases)
    assert(out.values.forall(_.isEmpty), s"all malformed must be null: $out")
    // and a good payload in the same column still decodes
    val ok = decodeBands(Seq(pgm(8, 8, px64)))
    assert(ok(0L).isDefined)
  }

  test("asPgm builds the exact canonical payload pgmAHash expects") {
    import spark.implicits._
    // text of 10 ASCII bytes rastered into 8x8: byte i = text[i mod 10]
    val text = "abcdefghij"
    val df = Seq((0L, text)).toDF("doc_id", "text")
    val payload = df.select(
      Multimodal.asPgm(col("text"), lit(8), lit(8)).as("p"))
      .as[Array[Byte]].head()
    val expected = pgm(8, 8,
      Array.tabulate(64)(i => text.charAt(i % 10).toByte))
    assert(payload.toSeq === expected.toSeq)
    // multi-byte text: the raster is the UTF-8 BYTE stream, repeated
    val df2 = Seq((0L, "é!")).toDF("doc_id", "text") // bytes C3 A9 21
    val p2 = df2.select(
      Multimodal.asPgm(col("text"), lit(8), lit(8)).as("p"))
      .as[Array[Byte]].head()
    val stream = Array(0xC3.toByte, 0xA9.toByte, 0x21.toByte)
    assert(p2.toSeq === pgm(8, 8,
      Array.tabulate(64)(i => stream(i % 3))).toSeq)
  }
}
