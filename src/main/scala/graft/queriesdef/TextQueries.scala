package graft.queriesdef
import graft.QueryRegistry.Entry
object TextQueries { def entries: Seq[Entry] = Seq() }
