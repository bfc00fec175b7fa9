package graft

import org.scalatest.funsuite.AnyFunSuite

/** q89 SCD2 invariants: intervals are disjoint and ordered, they cover
  * exactly the snapshots where the record is present, a presence gap
  * closes an interval, and is_current marks exactly the intervals open at
  * the last snapshot.
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private case class Iv(pkg: Long, version: String, from: Int, to: Int, current: Int)

  private lazy val ivs: Seq[Iv] =
    SparkEntry.queries("q89_scd2_history")(spark, SparkTestHarness.Sf0001)
      .collect()
      .map(r => Iv(r.getLong(0), r.getString(2), r.getInt(3), r.getInt(4), r.getInt(5)))
      .toSeq

  // the fixture rule: pkg_id is present in snapshot k iff (pkg_id+k)%23 != 0
  private def present(pkg: Long, k: Int): Boolean = (pkg + k) % 23 != 0

  test("intervals are well-formed, disjoint, and cover presence exactly") {
    assert(ivs.nonEmpty)
    ivs.foreach(iv => assert(iv.from <= iv.to))
    ivs.groupBy(_.pkg).foreach { case (pkg, rows) =>
      val sorted = rows.sortBy(_.from)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a.to < b.from, s"pkg $pkg: overlapping intervals $a $b")
        case _ => ()
      }
      val covered = sorted.flatMap(iv => iv.from to iv.to)
      val expected = (0 to 3).filter(k => present(pkg, k))
      assert(covered === expected, s"pkg $pkg: intervals must tile the presence set")
    }
  }

  test("a revision bump splits the interval; a stable version keeps one") {
    ivs.groupBy(_.pkg).foreach { case (pkg, rows) =>
      if (pkg % 3 == 0) {
        // version never changes: islands are induced by presence gaps only
        val expectedIslands = (0 to 3).filter(k => present(pkg, k))
          .foldLeft(List.empty[List[Int]]) {
            case (acc, k) if acc.nonEmpty && acc.head.head == k - 1 => (k :: acc.head) :: acc.tail
            case (acc, k) => List(k) :: acc
          }.length
        assert(rows.length === expectedIslands, s"pkg $pkg: stable version split unexpectedly")
      } else {
        // version changes at every present snapshot: one interval per snapshot
        assert(rows.length === (0 to 3).count(k => present(pkg, k)),
          s"pkg $pkg: each bump must open a new interval")
        assert(rows.map(_.version).distinct.length === rows.length)
      }
    }
  }

  test("is_current marks exactly the intervals open at snapshot 3") {
    ivs.foreach { iv =>
      assert((iv.current == 1) === (iv.to == 3), s"bad is_current on $iv")
    }
  }

  test("incremental merge of snapshot 4 equals the five-snapshot rebuild") {
    val dir = SparkTestHarness.Sf0001
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getInt(5))).toSet
    val snaps03 = (0 to 3).map(graft.queries.Packages.snapshotK(spark, dir, _))
      .reduce(_.unionByName(_))
    val snap4 = graft.queries.Packages.snapshotK(spark, dir, 4)
      .select("pkg_id", "name", "version")
    val merged = Graft.scd2Merge(Graft.scd2History(snaps03, 3), snap4, 4)
    val rebuilt = Graft.scd2History(
      snaps03.unionByName(graft.queries.Packages.snapshotK(spark, dir, 4)), 4)
    assert(collect(merged) === collect(rebuilt))
    // the merge must have actually exercised all three transitions
    val m = collect(merged)
    assert(m.exists(iv => iv._6 == 1 && iv._4 < 4 && iv._5 == 4), "no extended interval")
    assert(m.exists(iv => iv._6 == 1 && iv._4 == 4), "no newly opened interval")
    assert(m.exists(iv => iv._6 == 0 && iv._5 == 3), "no interval closed by the merge")
  }

  test("merge across a presence gap closes the open interval like the rebuild does") {
    // snapshot 4 never arrives; snapshot 5 merges into the history built
    // through 3. An unchanged version must NOT bridge the gap: the open
    // [_, 3] interval closes and a fresh [5, 5] one opens — the rebuild's
    // gaps-and-islands break rule, reproduced incrementally.
    val dir = SparkTestHarness.Sf0001
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getInt(5))).toSet
    val snaps03 = (0 to 3).map(graft.queries.Packages.snapshotK(spark, dir, _))
      .reduce(_.unionByName(_))
    val snap5 = graft.queries.Packages.snapshotK(spark, dir, 5)
      .select("pkg_id", "name", "version")
    val merged = Graft.scd2Merge(Graft.scd2History(snaps03, 3), snap5, 5)
    val rebuilt = Graft.scd2History(
      snaps03.unionByName(graft.queries.Packages.snapshotK(spark, dir, 5)), 5)
    assert(collect(merged) === collect(rebuilt))
    // the gap rule actually fired: some closed interval ends at 3 while
    // the same pkg reopens at 5 with the SAME version (pkg_id % 3 == 0
    // packages never change version, so only the gap can split them)
    val m = collect(merged)
    assert(m.exists(iv => iv._1 % 3 == 0 && iv._6 == 0 && iv._5 == 3 &&
      m.exists(o => o._1 == iv._1 && o._3 == iv._3 && o._4 == 5 && o._6 == 1)),
      "no stable-version interval split by the presence gap")
  }

  test("one-scan snapshots(maxK) equals the unioned per-k snapshot derivation") {
    val dir = SparkTestHarness.Sf0001
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3))).toSet
    val oneScan = collect(graft.queries.Packages.snapshots(spark, dir, 3))
    val unioned = collect((0 to 3).map(graft.queries.Packages.snapshotK(spark, dir, _))
      .reduce(_.unionByName(_)))
    assert(oneScan === unioned)
  }

  test("asOf(k) through the history equals the raw snapshot for every k") {
    val dir = SparkTestHarness.Sf0001
    val hist = Graft.scd2History(
      (0 to 3).map(graft.queries.Packages.snapshotK(spark, dir, _))
        .reduce(_.unionByName(_)), 3)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    (0 to 3).foreach { k =>
      val viaHistory = collect(Graft.asOf(hist, k))
      val direct = collect(graft.queries.Packages.snapshotK(spark, dir, k)
        .select("pkg_id", "name", "version"))
      assert(viaHistory === direct, s"asOf($k) diverges from the raw snapshot")
    }
  }

  test("merging a snapshot the history already covers fails loudly") {
    // k=3 is not beyond the open intervals' valid_to=3 — instead of
    // silently emitting overlapping intervals, the eager call-time probe
    // raises.
    val dir = SparkTestHarness.Sf0001
    val snaps03 = (0 to 3).map(graft.queries.Packages.snapshotK(spark, dir, _))
      .reduce(_.unionByName(_))
    val snap3 = graft.queries.Packages.snapshotK(spark, dir, 3)
      .select("pkg_id", "name", "version")
    val ex = intercept[Exception] {
      Graft.scd2Merge(Graft.scd2History(snaps03, 3), snap3, 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("scd2Merge")), s"unexpected error: $ex")
  }

  test("the guard does not fire on rows a join inside the history drops") {
    // history = intervals joined to a dim that excludes pkg B, whose open
    // interval (valid_to=5) would violate k=4. The eager probe evaluates
    // the history frame's POST-join semantics (unlike an in-plan assert,
    // which predicate pushdown can sink below this join) — the merge must
    // see only A's rows and stay silent.
    import spark.implicits._
    val intervals = Seq(
      (1L, "A", "1.0", 0, 3, 1),
      (2L, "B", "2.0", 0, 5, 1))
      .toDF("pkg_id", "name", "version", "valid_from", "valid_to", "is_current")
    val dim = Seq("A").toDF("name")
    val history = intervals.join(dim, "name")
      .select("pkg_id", "name", "version", "valid_from", "valid_to", "is_current")
    val snap = Seq((1L, "A", "1.1")).toDF("pkg_id", "name", "version")
    val out = Graft.scd2Merge(history, snap, 4).collect()
    // A's 1.0 interval closes (gap: valid_to=3, k=4) and 1.1 opens at [4,4]
    assert(out.map(r => (r.getLong(0), r.getString(2), r.getInt(5))).toSet ===
      Set((1L, "1.0", 0), (1L, "1.1", 1)))
  }

  test("an open interval with NULL valid_to is malformed and raises") {
    // without the probe's null arm, the merge's branch filters would
    // silently drop both the open row and the arriving record
    import spark.implicits._
    val hist = Seq((1L, "A", "1.0", 0, Option.empty[Int], 1))
      .toDF("pkg_id", "name", "version", "valid_from", "valid_to", "is_current")
    val snap = Seq((1L, "A", "1.0")).toDF("pkg_id", "name", "version")
    val ex = intercept[IllegalArgumentException] { Graft.scd2Merge(hist, snap, 4) }
    assert(ex.getMessage.contains("scd2Merge"))
  }

  test("the merge overlap guard survives a downstream projection pruning valid_to") {
    // the guard is an eager call-time probe, so no downstream projection
    // (here a pkg_id-only select) can optimize it away
    val dir = SparkTestHarness.Sf0001
    val snaps03 = (0 to 3).map(graft.queries.Packages.snapshotK(spark, dir, _))
      .reduce(_.unionByName(_))
    val snap3 = graft.queries.Packages.snapshotK(spark, dir, 3)
      .select("pkg_id", "name", "version")
    val ex = intercept[Exception] {
      Graft.scd2Merge(Graft.scd2History(snaps03, 3), snap3, 3)
        .select("pkg_id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("scd2Merge")), s"unexpected error: $ex")
  }
}
