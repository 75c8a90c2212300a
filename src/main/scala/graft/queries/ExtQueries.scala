package graft.queries
import graft.QDef
object ExtQueries {
  val defs: Seq[QDef] = Seq()
}
