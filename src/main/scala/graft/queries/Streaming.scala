package graft.queries

object Streaming {
  val defs: Seq[QueryDef] = Seq()
}
