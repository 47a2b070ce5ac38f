package graft.queries

import graft.QueryDef

object StreamingQueries {
  def defs: Seq[(String, QueryDef)] = Seq()
}
