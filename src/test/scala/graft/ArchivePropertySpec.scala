package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ArchiveCodec

/** Archive roundtrip property: for RANDOM member sets (names spanning the
  * tar header edge cases — deep paths, 1-char names, >100-char names that
  * force PAX long-name extensions — and contents spanning empty, 511/512/
  * 513-byte block boundaries, and high-entropy binary), build → list →
  * extract must be the identity through every codec. Exercised directly on
  * the static core (the interpreted path; ArchiveSpec's DataFrame probes
  * cover codegen).
  */
class ArchivePropertySpec extends AnyFunSuite {
  private val rng = new scala.util.Random(4242)

  private def randName(): String = {
    val depth = 1 + rng.nextInt(3)
    val parts = Seq.fill(depth) {
      val len = 1 + rng.nextInt(if (rng.nextInt(5) == 0) 120 else 20)
      Seq.fill(len)(('a' + rng.nextInt(26)).toChar).mkString
    }
    parts.mkString("/")
  }

  private def randBody(): Array[Byte] = {
    val n = rng.nextInt(6) match {
      case 0 => 0
      case 1 => 511
      case 2 => 512
      case 3 => 513
      case _ => rng.nextInt(2000)
    }
    val b = new Array[Byte](n); rng.nextBytes(b); b
  }

  private def build(members: Seq[(String, Array[Byte])], codec: String): Array[Byte] =
    ArchiveCodec.tarArchive(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        members.map(m => org.apache.spark.unsafe.types.UTF8String.fromString(m._1)).toArray),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(members.map(_._2).toArray),
      codec)

  test("random member sets roundtrip through every codec (list + extract identity)") {
    for (trial <- 0 until 25) {
      val names = Seq.fill(1 + rng.nextInt(8))(randName()).distinct
      val members = names.map(_ -> randBody())
      val codec = Seq("none", "gzip", "xz", "zstd")(trial % 4)
      val bytes = build(members, codec)

      val fmt = ArchiveCodec.format(bytes)
      assert(fmt != null && fmt.toString ===
        (if (codec == "none") "tar" else s"tar+$codec"), s"trial $trial")

      val listed = ArchiveCodec.members(bytes)
      assert(listed != null, s"trial $trial: members null")
      val got = (0 until listed.numElements()).map { i =>
        val r = listed.getStruct(i, 2)
        r.getUTF8String(0).toString -> r.getLong(1)
      }
      assert(got === members.map(m => m._1 -> m._2.length.toLong), s"trial $trial")

      members.foreach { case (n, body) =>
        val x = ArchiveCodec.extract(bytes, org.apache.spark.unsafe.types.UTF8String.fromString(n))
        assert(x != null && java.util.Arrays.equals(x, body), s"trial $trial member $n")
      }
    }
  }

  test("mismatched name/content arity and null elements yield null, not garbage") {
    val one = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("a")))
    val two = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array[Any]("x".getBytes("UTF-8"), "y".getBytes("UTF-8")))
    assert(ArchiveCodec.tarArchive(one, two, "none") === null)
    val nullName = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array[Any](null))
    val oneBody = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array[Any]("x".getBytes("UTF-8")))
    assert(ArchiveCodec.tarArchive(nullName, oneBody, "none") === null)
  }

  test("truncated archives never throw: every prefix is a member list or null") {
    val bytes = build(Seq("dir/file.bin" -> Array.fill[Byte](700)(7)), "gzip")
    for (cut <- 0 to bytes.length by 37) {
      val prefix = java.util.Arrays.copyOf(bytes, cut)
      // must not throw — null or a (possibly partial) listing are both
      // fine; extract additionally covers the truncated-body read path
      // (header promises 700 bytes the stream no longer carries)
      ArchiveCodec.members(prefix)
      ArchiveCodec.format(prefix)
      ArchiveCodec.extract(prefix,
        org.apache.spark.unsafe.types.UTF8String.fromString("dir/file.bin"))
      ArchiveCodec.inspect(prefix,
        org.apache.spark.unsafe.types.UTF8String.fromString("dir/file.bin"))
    }
  }
}
