package graft.streaming

/** Shared op-ordering rule for the two log-structured streaming indexes
  * ([[StreamingIvf]], [[StreamingIndex]]): committed segments and
  * tombstones apply in NAME order — "base" pinned first, then NATURAL
  * order (digit runs compare numerically, so the framework-generated
  * `b2` sorts before `b10`; plain lexicographic would put `b10` first
  * and mis-apply any tombstone interleaved past ten streaming batches);
  * at equal names the tombstone applies BEFORE the same-named segment,
  * which is what makes the one-batch upsert (tombstone + re-fold under
  * one name) well-defined. Consecutive same-kind ops coalesce into runs
  * so the common all-tombstones-last history plans exactly one union +
  * one anti-join.
  *
  * UPGRADE NOTE (lexicographic → natural, round 11): an index persisted
  * under the old lexicographic rule whose names mixed padded and
  * unpadded numbers past ten batches (`b2` vs `b10`) replays in a
  * DIFFERENT order under natural order — served results can change
  * silently, since there is no on-disk ordering-version marker. Run
  * `compact()` on any existing mixed-name index BEFORE upgrading (a
  * compacted index is a single "base" segment, ordering-rule-proof);
  * new installs are strictly safer under natural order.
  */
private[streaming] object LsmOps {

  final case class Op(name: String, tomb: Boolean)

  /** Natural string order: names split into alternating non-digit /
    * digit runs; digit runs compare by numeric value (BigInt — no
    * overflow on long ids), ties broken by the raw run (so `b2` < `b02`
    * is deterministic), non-digit runs compare lexicographically. This
    * makes unpadded streaming batch ids (`b0`, `b1`, …, `b10`, …) sort
    * in arrival order with no caller-side padding discipline, while
    * padded and hand-chosen names keep their lexicographic intent.
    */
  private[streaming] val naturalOrder: Ordering[String] =
    new Ordering[String] {
      private def chunks(s: String): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          val digit = s.charAt(i).isDigit
          var j = i
          while (j < s.length && s.charAt(j).isDigit == digit) j += 1
          out += s.substring(i, j)
          i = j
        }
        out.result()
      }
      def compare(a: String, b: String): Int = {
        val ca = chunks(a); val cb = chunks(b)
        var i = 0
        while (i < ca.length && i < cb.length) {
          val x = ca(i); val y = cb(i)
          val c =
            if (x.charAt(0).isDigit && y.charAt(0).isDigit) {
              val n = BigInt(x).compare(BigInt(y))
              if (n != 0) n
              else if (x.length != y.length) x.length - y.length
              else x.compareTo(y)
            } else x.compareTo(y)
          if (c != 0) return c
          i += 1
        }
        ca.length - cb.length
      }
    }

  def runs(segs: Seq[String], tombs: Seq[String]): List[List[Op]] = {
    val ops = (segs.map(Op(_, tomb = false)) ++ tombs.map(Op(_, tomb = true)))
      .sortBy(o => (o.name != "base", o.name, !o.tomb))(
        Ordering.Tuple3(Ordering.Boolean, naturalOrder, Ordering.Boolean))
    ops.foldRight(List.empty[List[Op]]) {
      case (op, (h :: t) :: rest) if h.tomb == op.tomb => (op :: h :: t) :: rest
      case (op, acc) => List(op) :: acc
    }
  }
}
