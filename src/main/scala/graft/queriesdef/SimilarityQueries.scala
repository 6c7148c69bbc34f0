package graft.queriesdef
import graft.QueryRegistry.Entry
object SimilarityQueries { def entries: Seq[Entry] = Seq() }
