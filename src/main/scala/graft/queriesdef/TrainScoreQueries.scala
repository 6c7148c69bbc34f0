package graft.queriesdef
import graft.QueryRegistry.Entry
object TrainScoreQueries { def entries: Seq[Entry] = Seq() }
