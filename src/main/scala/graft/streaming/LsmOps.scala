package graft.streaming

/** Shared op-ordering rule for the two log-structured streaming indexes
  * ([[StreamingIvf]], [[StreamingIndex]]): committed segments and
  * tombstones apply in NAME order — "base" pinned first, then
  * lexicographic; at equal names the tombstone applies BEFORE the
  * same-named segment, which is what makes the one-batch upsert
  * (tombstone + re-fold under one name) well-defined. Consecutive
  * same-kind ops coalesce into runs so the common all-tombstones-last
  * history plans exactly one union + one anti-join.
  */
private[streaming] object LsmOps {

  final case class Op(name: String, tomb: Boolean)

  def runs(segs: Seq[String], tombs: Seq[String]): List[List[Op]] = {
    val ops = (segs.map(Op(_, tomb = false)) ++ tombs.map(Op(_, tomb = true)))
      .sortBy(o => (o.name != "base", o.name, !o.tomb))
    ops.foldRight(List.empty[List[Op]]) {
      case (op, (h :: t) :: rest) if h.tomb == op.tomb => (op :: h :: t) :: rest
      case (op, acc) => List(op) :: acc
    }
  }
}
