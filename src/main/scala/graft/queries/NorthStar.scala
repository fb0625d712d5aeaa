package graft.queries

object NorthStar {
  val defs: Seq[QueryDef] = Seq()
}
