package graft.queries

import graft.QueryDef

object SimilarityQueries {
  def defs: Seq[(String, QueryDef)] = Seq()
}
