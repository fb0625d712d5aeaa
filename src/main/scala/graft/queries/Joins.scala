package graft.queries

object Joins {
  val defs: Seq[QueryDef] = Seq()
}
