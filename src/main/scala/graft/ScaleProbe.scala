package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only weak-scaling probe (deleted before round close): times the
  * round's NEW operator families UNCAPPED over the natural documents
  * table of a given sf dir. `runMain graft.ScaleProbe <sfDir> <probe>`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probe = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "48g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents").localCheckpoint(true)
    println(s"[probe] $probe over ${docs.count()} docs @ $sfDir")

    def run(tag: String)(df: => DataFrame): Unit = {
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $tag rep$r: $s%.2f s ($n rows)")
      }
    }

    probe match {
      case "http" =>
        // full HTTP envelope corpus: one message per doc, mixed framing
        val msgs = docs.select(col("doc_id"),
          concat(
            lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
              "charset=UTF-8\r\nContent-Length: "),
            length(coalesce(col("text"), lit(""))).cast("string"),
            lit("\r\n\r\n"), coalesce(col("text"), lit(""))).as("msg"))
          .localCheckpoint(true)
        run("HttpMessage.responses")(
          graft.operators.HttpMessage.responses(msgs, "doc_id", "msg"))
      case "charset" =>
        run("CharsetDecode.decodeAll")(
          graft.operators.CharsetDecode.decodeAll(
            docs, "doc_id", "text"))
      case "langid" =>
        run("TrainedLangId.trainAndPredict")(
          graft.operators.TrainedLangId.trainAndPredict(
            docs, "doc_id", "text", "lang"))
      case "sitemap" =>
        // one urlset per DOC (host per doc mod 997): frontier scales
        // with the corpus, robots fixed per host
        val sm = docs.select(
          concat(lit("h"), (col("doc_id") % 997).cast("string"),
            lit(".example.net")).as("host"),
          concat(lit("https://h"), (col("doc_id") % 997).cast("string"),
            lit(".example.net/s/"), col("doc_id").cast("string"),
            lit(".xml")).as("url"),
          concat(lit("<urlset><url><loc>https://h"),
            (col("doc_id") % 997).cast("string"),
            lit(".example.net/p/"), col("doc_id").cast("string"),
            lit("</loc><lastmod>2024-05-01</lastmod></url>" +
              "<url><loc>https://h"),
            (col("doc_id") % 997).cast("string"),
            lit(".example.net/private/"), col("doc_id").cast("string"),
            lit("</loc></url></urlset>")).as("body"))
          .localCheckpoint(true)
        val robots = sm.select(col("host")).distinct()
          .select(col("host"),
            lit("User-agent: *\nDisallow: /private/\n").as("robots"))
          .localCheckpoint(true)
        run("Sitemap.governedFrontier")(
          graft.operators.Sitemap.governedFrontier(
            sm, "host", "url", "body", robots, "host", "robots", "bot"))
      case "tar" =>
        val out = java.nio.file.Files
          .createTempDirectory("probe_tar").toString
        (1 to reps).foreach { r =>
          val t0 = System.nanoTime()
          graft.operators.ShardExport.writeTar(
            docs, "doc_id", "text", "source", 20000, out)
          val s = (System.nanoTime() - t0) / 1e9
          println(f"[probe] ShardExport.writeTar rep$r: $s%.2f s")
        }
      case "unigram-train" =>
        run("UnigramTokenizer.trainAndSegment")(
          graft.operators.UnigramTokenizer.trainAndSegment(
            docs, "text", rounds = 2))
      case "explain" =>
        val msgs = docs.select(col("doc_id"),
          concat(lit("HTTP/1.1 200 OK\r\nContent-Length: "),
            length(coalesce(col("text"), lit(""))).cast("string"),
            lit("\r\n\r\n"), coalesce(col("text"), lit(""))).as("msg"))
        println("=== HttpMessage.responses (uncheckpointed) ===")
        graft.operators.HttpMessage.responses(msgs, "doc_id", "msg")
          .explain("formatted")
        println("=== TrainedLangId.predict (uncheckpointed score) ===")
        val (model, priors) = graft.operators.TrainedLangId
          .train(docs, "text", "lang")
        graft.operators.TrainedLangId
          .predict(docs, "doc_id", "text", model, priors)
          .explain("formatted")
      case "links" =>
        // ~6 anchors per doc, mixed forms; host per doc mod 997
        val pages = docs.select(col("doc_id"),
          concat(lit("https://h"), (col("doc_id") % 997).cast("string"),
            lit(".example.net/a/b/p"), col("doc_id").cast("string"),
            lit(".html")).as("url"),
          concat(
            lit("<a href=\"https://ext"), (col("doc_id") % 7).cast("string"),
            lit(".example.com/x/"), col("doc_id").cast("string"),
            lit("\">1</a><a href='/r/"), col("doc_id").cast("string"),
            lit("'>2</a><a href=../u/"), col("doc_id").cast("string"),
            lit(">3</a><a href=\"?p=2\">4</a><a href=\"#t\">5</a>"),
            lit("<a href=\"//cdn.example.org/l.js\">6</a>")).as("html"))
          .localCheckpoint(true)
        run("LinkExtract.outlinks")(
          graft.operators.LinkExtract.outlinks(
            pages, "doc_id", "url", "html"))
      case "unigram-apply" =>
        val pieces = graft.operators.UnigramTokenizer
          .trainPieces(docs, "text", rounds = 2)
        run("UnigramTokenizer.applyByVocab")(
          graft.operators.UnigramTokenizer.applyByVocab(
            docs, "doc_id", "text", pieces))
    }
    spark.stop()
  }
}
