package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: dumps the formatted physical plan of each named
  * query (or a default load-bearing set) so scan pruning, pushdown,
  * broadcast choices, and WholeStageCodegen coverage can be reviewed.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_scan_filter", "q11_join", "q12_agg", "q13_topk",
        "q18_cosine_topk", "q18_minhash_pairs", "q18_dedup_embed",
        "q16_stream_join", "q20_range_join", "q18_line_dedup",
        "q18_domain_mix", "q18_unigram_lp", "q22_funnel",
        "q20_dpp", "q20_bucket_join", "q18_dsir", "q18_kmeans",
        "q18_source_overlap", "q10_gapfill")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(f) =>
          println(s"\n========== $n ==========")
          f(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
