package graft.queriesdef
import graft.QueryRegistry.Entry
object EventQueries { def entries: Seq[Entry] = Seq() }
