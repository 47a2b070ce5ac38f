package graft.queries

import graft.QueryDef

object DedupQueries {
  def defs: Seq[(String, QueryDef)] = Seq()
}
