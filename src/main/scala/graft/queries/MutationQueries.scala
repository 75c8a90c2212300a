package graft.queries
import graft.QDef
object MutationQueries {
  val defs: Seq[QDef] = Seq()
}
