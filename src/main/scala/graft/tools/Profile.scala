package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ext.{Dedup, TextOps}
import graft.queries.ExtensionQueries

/** Dev profiling harness for the heavy extension plans (not part of the
  * driver contract).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = documents(spark, d)
    docs.count()
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    time("signatures (evaluated)")(sigs.agg(sum("sig_0")).head())
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
    time("candidates")(println("n_cand=" + cand.count()))
    time("minhash_pairs full query") {
      println("n_pairs=" + ExtensionQueries.queries("dedup_minhash_pairs")(spark, d).count())
    }
    time("simhash full query") {
      ExtensionQueries.queries("dedup_simhash")(spark, d).agg(sum("simhash")).head()
    }
    time("simhash_pairs full query") {
      println("n_sh_pairs=" + ExtensionQueries.queries("dedup_simhash_pairs")(spark, d).count())
    }
    time("ngram_jaccard full query") {
      println("n_ngram=" + ExtensionQueries.queries("ngram_jaccard_pairs")(spark, d).count())
    }
    time("text_stats full query") {
      ExtensionQueries.queries("text_stats")(spark, d).agg(sum("n_punct")).head()
    }
    time("text_langid full query") {
      ExtensionQueries.queries("text_langid")(spark, d).groupBy("lang_pred").count().head()
    }
    spark.stop()
  }
}
