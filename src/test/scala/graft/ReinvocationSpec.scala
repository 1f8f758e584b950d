package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must be RE-INVOCABLE in one session with
  * identical results — the interactive-user path. Stateless queries are
  * trivially so; the risk sits in queries that create session or
  * filesystem state (temp views, `CACHE TABLE`, staged artifact dirs,
  * stream checkpoints): a leftover view throws TempTableAlreadyExists, a
  * stale checkpoint replays old offsets, a non-overwrite artifact write
  * fails outright. `sql_minhash_pairs` shipped exactly that bug once
  * (fixed in ExtensionsSpec's re-invocation test); this suite pins the
  * rest of the stateful set.
  *
  * sf0.001 keeps the double execution cheap; result equality is on the
  * full collected row set (ordering per the query's own ORDER BY). */
class ReinvocationSpec extends AnyFunSuite with SparkSpec {

  /** Queries that create state outside the returned plan: in-query
    * artifact writes (staged dirs), temp views, streaming checkpoints. */
  private val stateful = Seq(
    "q2_above_avg_subquery",     // temp view
    "ta_bpe_artifact",           // staged merge-table parquet
    "ta_wordpiece_artifact",     // staged vocab parquet
    "dedup_pairs_artifact",      // staged pair-graph parquet
    "e2e_corpus_from_artifact",  // stages then consumes the pair graph
    "sim_bm25_index",            // staged postings index
    "src_orc_roundtrip",         // ORC write + read-back
    "layout_pruned_scan",        // partitioned layout write
    "layout_compaction",         // compacted layout write
    "layout_zorder",             // z-ordered layout write
    "k1_batch_layout",           // per-article JSON batch sink
    "stream_near_dup",           // file stream + signature index + checkpoint
    "stream_curate",             // file stream + gate + shard checkpoint
    "stream_decontam",           // file stream + universe probe + checkpoint
    "stream_sessions",           // file stream + session state + checkpoint
    "stream_attribution",        // staged slices + stream-stream join state
    "stream_attribution_outer",  // same + watermark-deferred null legs
    "stream_dq",                 // file stream + per-batch audit + checkpoint
    "ta_unigram_artifact",       // staged vocab parquet (cross-family load)
    "web_template_incr",         // staged strip-set parquet + frozen apply
    "sql_ann_topk",              // temp views + CACHE TABLE
    "src_csv_roundtrip",         // CSV write + read-back
    "src_schema_evolution")      // two-schema staged write + merged read

  stateful.foreach { name =>
    test(s"$name re-invokes in one session with identical results") {
      val fn = SparkEntry.queries(name)
      val first = fn(spark, sfDir).collect().map(_.toString).sorted
      val second = fn(spark, sfDir).collect().map(_.toString).sorted
      assert(first.nonEmpty, s"$name returned no rows at sf0.001")
      assert(first.sameElements(second),
        s"$name changed results on re-invocation: " +
          s"${first.length} vs ${second.length} rows")
    }
  }
}
