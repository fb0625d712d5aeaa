package graft.queries

object Windows {
  val defs: Seq[QueryDef] = Seq()
}
