package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ordered-LSM name ordering ([[LsmOps]]): natural order makes
  * the framework's own unpadded `b<batchId>` streaming names sort in
  * arrival order past ten batches — under plain lexicographic order a
  * post-takedown re-ingest fold `b12` would sort before an earlier
  * tombstone `b9` and its docs would be wrongly suppressed.
  */
class LsmOpsSpec extends AnyFunSuite {

  private def flat(segs: Seq[String], tombs: Seq[String]): List[(String, Boolean)] =
    LsmOps.runs(segs, tombs).flatten.map(op => (op.name, op.tomb))

  test("natural order: b10 sorts after b2 (unpadded streaming names)") {
    val got = flat(Seq("b10", "b2", "base", "b1"), Seq.empty).map(_._1)
    assert(got === List("base", "b1", "b2", "b10"))
  }

  test("tombstone b9 applies before later fold b12, not after") {
    // lexicographic would order b12 < b9 and suppress the re-ingest
    val got = flat(Seq("base", "b12"), Seq("b9"))
    assert(got === List(("base", false), ("b9", true), ("b12", false)))
  }

  test("tombstone applies before the same-named segment (one-batch upsert)") {
    val got = flat(Seq("base", "b3"), Seq("b3"))
    assert(got === List(("base", false), ("b3", true), ("b3", false)))
  }

  test("base pins first even against numerically smaller names") {
    val got = flat(Seq("b0", "base"), Seq.empty).map(_._1)
    assert(got === List("base", "b0"))
  }

  test("consecutive same-kind ops coalesce into runs") {
    val runs = LsmOps.runs(Seq("base", "b1", "b2"), Seq("t3", "t4"))
    assert(runs.map(r => (r.head.tomb, r.size)) === List((false, 3), (true, 2)))
  }

  test("numeric ties break on the raw run; mixed alpha/digit chunks order") {
    val ord = LsmOps.naturalOrder
    assert(ord.compare("b2", "b02") < 0)     // equal value, shorter run first
    assert(ord.compare("b2x1", "b2x10") < 0) // trailing digit runs numeric
    assert(ord.compare("a9", "b1") < 0)      // alpha chunk dominates
    assert(ord.compare("b123456789012345678901234567890", "b2") > 0) // BigInt
  }
}
