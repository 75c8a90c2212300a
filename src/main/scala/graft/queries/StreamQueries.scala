package graft.queries
import graft.QDef
object StreamQueries {
  val defs: Seq[QDef] = Seq()
}
