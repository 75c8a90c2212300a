package graft.queries
import graft.QDef
object FilterQueries {
  val defs: Seq[QDef] = Seq()
}
