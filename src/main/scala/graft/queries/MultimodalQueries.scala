package graft.queries

import graft.QueryDef

object MultimodalQueries {
  def defs: Seq[(String, QueryDef)] = Seq()
}
