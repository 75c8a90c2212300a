package graft.queries
import graft.QDef
object AggQueries {
  val defs: Seq[QDef] = Seq()
}
