package graft.queriesdef
import graft.QueryRegistry.Entry
object FeatureQueries { def entries: Seq[Entry] = Seq() }
