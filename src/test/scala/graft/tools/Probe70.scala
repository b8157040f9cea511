package graft.tools

import org.apache.spark.sql.functions._

object Probe70 {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.builder("32").getOrCreate()
    val d = "/root/testdata/sf0.1"
    import graft.queries.Tables
    val text = graft.functions.text
    import graft.functions.{detlog, detsum}
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    for (_ <- 1 to 2) {
      val base = Tables(s, d, "documents").withColumn("toks", text.tokens(col("text")))
      val grams = base
        .select(col("doc_id"), col("source"),
          explode(concat(col("toks"), text.shingles(col("toks"), 2))).as("g"))
        .withColumn("b", substring(md5(col("g").cast("binary")), 1, 2))
      time("gram_count")(println("  n=" + grams.count()))
      val counts0 = time("counts0_ckpt")(grams.groupBy(col("b")).agg(
        count(lit(1)).as("cr"),
        count(when(col("source") === "src0", 1)).as("ct0"))
        .localCheckpoint(true))
      val counts1 = counts0
        .withColumn("crp", col("cr") + lit(1L))
        .withColumn("ctp", col("ct0") + lit(1L))
      val bucketLg = detlog.withLog2(detlog.withLog2(counts1, "ctp", "lgt"), "crp", "lgr")
      val tot = counts0.agg(
        (sum(col("cr")) + lit(256L)).as("nr"),
        (sum(col("ct0")) + lit(256L)).as("nt"))
      val totLg = detlog.withLog2(detlog.withLog2(tot, "nt", "lgnt"), "nr", "lgnr")
      val w = bucketLg
        .crossJoin(broadcast(totLg.select(col("lgnt"), col("lgnr"))))
        .select(col("b"), ((col("lgt") - col("lgnt")) - (col("lgr") - col("lgnr"))).as("w"))
      val wc = time("w_ckpt")(w.localCheckpoint(true))
      val res = time("score")(grams.join(broadcast(wc), Seq("b"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_feat"), detsum.sumDet(col("w"), 9).as("sw"))
        .select(col("doc_id"), col("source"), col("n_feat"), round(col("sw"), 6).as("logratio"))
        .orderBy(col("logratio").desc, col("doc_id").asc)
        .limit(20).collect())
      println("  rows=" + res.length)
    }
    s.stop()
  }
}
