package graft.llm

import org.apache.spark.sql.functions._
import graft.batch.Q
import graft.core.Tables

/** The end-to-end corpus-prep pipeline — the north-star composition: the
  * individual operators (quality gate, exact dedup, near-dup clustering,
  * chunking) chained exactly as a pre-training data-prep job would run
  * them, as ONE oracle-gated query.
  *
  * A document survives iff it (1) passes the quality gate, (2) is its
  * exact-dup group's keeper (min doc_id per content hash), and (3) is not
  * a non-keeper member of a near-dup cluster. Survivors are chunked for
  * tokenization.
  *
  * Scale shape: the quality gate and exact-dedup keeper are one pass +
  * one content-hash shuffle over the corpus; the near-dup component table
  * holds only docs in a duplicate cluster — usually far smaller than the
  * corpus, but web-scale crawls run 30–50% near-dups, so the join is left
  * UNhinted and AQE broadcasts it only when it measures small; chunking is
  * a row-local explode of the survivors.
  */
object PipelineQueries {

  val all: Seq[Q] = Seq(

    Q("llm_corpus_prep",
      s"""WITH RECURSIVE ${DedupQueries.clusterCtes},
         |${TextQueries.qualityCtes},
         |exk AS (SELECT md5(text) AS h, min(doc_id) AS keeper FROM documents GROUP BY 1),
         |surv AS (
         |  SELECT doc.doc_id, doc.text
         |  FROM documents doc
         |  JOIN exk ON md5(doc.text) = exk.h AND doc.doc_id = exk.keeper
         |  JOIN qual ON qual.doc_id = doc.doc_id AND qual.keep = 1
         |  LEFT JOIN comp ON comp.doc_id = doc.doc_id
         |  WHERE comp.doc_id IS NULL OR comp.cluster_id = doc.doc_id
         |)
         |SELECT doc_id,
         |  CAST((pos - 1) // ${TextQueries.chunkStep} AS BIGINT) AS chunk_idx,
         |  md5(substring(text, CAST(pos AS INT), ${TextQueries.chunkLen})) AS chunk_hash
         |FROM surv, unnest(generate_series(1, greatest(length(text), 1), ${TextQueries.chunkStep})) AS t(pos)
         |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val exk = docs.groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("keeper"))
      val qual = TextQueries.qualityKeepDF(s, d).filter(col("keep") === 1).select("doc_id")
      val comp = DedupQueries.clustersDF(s, d)
      docs
        .join(exk, md5(col("text")) === col("h") && col("doc_id") === col("keeper"))
        .join(qual, Seq("doc_id"), "left_semi")
        .join(comp, Seq("doc_id"), "left")
        .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
        .select(col("doc_id"), col("text"))
        .withColumn("pos",
          explode(expr(s"sequence(1, greatest(length(text), 1), ${TextQueries.chunkStep})")))
        .select(col("doc_id"),
          expr(s"cast((pos - 1) div ${TextQueries.chunkStep} as bigint)").as("chunk_idx"),
          expr(s"md5(substring(text, pos, ${TextQueries.chunkLen}))").as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    },
  )
}
