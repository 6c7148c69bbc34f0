package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length == 2 || args.length == 3,
      "usage: Verify <sfDir> <outDir> [name1,name2,...]")
    val sfDir = args(0); val outDir = args(1)
    // dev-only selector (the driver always passes 2 args): restrict the
    // dump — and the emitted oracle json — to the named queries
    val selected: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] =
      if (args.length == 3) {
        val names = args(2).split(",").map(_.trim).toSet
        val missing = names -- SparkEntry.queries.keySet
        require(missing.isEmpty, s"unknown queries: ${missing.mkString(",")}")
        SparkEntry.queries.view.filterKeys(names).toMap
      } else SparkEntry.queries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // one bucketed+pinned silver fact for the whole dump (values identical;
    // see core.SilverStore)
    graft.core.SilverStore.enable()
    selected.foreach { case (name, fn) =>
      // Remove any previous run's result FIRST: a query that now fails
      // must not leave its old (stale) parquet behind, or the compare
      // would silently report a false PASS for a broken query.
      val target = Paths.get(outDir, name)
      if (Files.exists(target)) {
        val walk = Files.walk(target)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        } finally walk.close()
      }
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // e.toString keeps the exception class (getMessage is null for NPEs)
        System.err.println(s"[verify] $name failed: $e")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.view.filterKeys(selected.keySet)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
