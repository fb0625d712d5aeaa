package graft.queries

object Scalars {
  val defs: Seq[QueryDef] = Seq()
}
