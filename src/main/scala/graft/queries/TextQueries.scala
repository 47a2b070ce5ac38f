package graft.queries

import graft.QueryDef

object TextQueries {
  def defs: Seq[(String, QueryDef)] = Seq()
}
