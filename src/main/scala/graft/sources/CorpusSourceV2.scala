package graft.sources

import java.util.Base64

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A CUSTOM DataSourceV2 connector over the staged corpus-chunk format —
  * the Spark extension point the reference's enumeration scan maps onto
  * (S1's `gapcontinue` continuation cursor,
  * `/root/reference/src/mediawiki_client.py:66-112`; SURVEY.md §2.1 maps
  * it to "partition offsets of a DataSourceV2 `Batch`/`MicroBatchStream`"):
  * the corpus is a directory of monotonically-named chunk files, each
  * partition owns a contiguous CURSOR RANGE of chunks and enumerates it
  * independently — which is exactly how a non-file corpus (an API with
  * continuation tokens, a key-range store) plugs into Spark.
  *
  * Chunk format (written by [[CorpusSourceV2.stage]]): newline-delimited
  * records `doc_id \t source \t lang \t base64(text)` — base64 because
  * document text carries tabs/newlines. Schema is FIXED (the reference's
  * article shape), so `inferSchema` costs no I/O.
  *
  * What the connector implements beyond the minimum:
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): the reader
  *    splits each line lazily and only decodes the base64 text when the
  *    projection asks for it — a `select(doc_id)` never pays the decode.
  *  - FILTER PUSHDOWN (`SupportsPushDownFilters`): comparisons/`IN` on
  *    `doc_id` and equality on `source`/`lang` evaluate INSIDE the reader
  *    before row materialization; anything else (e.g. predicates on
  *    `text`) is returned to Spark as a residual. `Scan.description`
  *    carries the pushed set so `.explain` shows it.
  *  - the MICRO-BATCH face (`toMicroBatchStream`): the stream offset is
  *    the NAME of the last consumed chunk — a high-watermark cursor (the
  *    reference persists its continuation cursor the same way; K4's queue
  *    persistence). A count-based offset ("n chunks consumed") would
  *    silently shift if any chunk ever sorted BEFORE a consumed one (a
  *    late drop-in, a compaction of the chunk format) — re-reading or
  *    skipping data; the watermark is immune to prefix perturbation: a
  *    batch is always exactly the chunks in (start.name, end.name].
  *    Chunk names must still be append-MONOTONE for new data to be seen
  *    (a chunk sorting at or before the watermark is treated as already
  *    consumed) — the [[stage]] writer and every dump layout satisfy
  *    this, and any compaction of consumed chunks must keep compacted
  *    names at or below the watermark (the compaction-vs-offset
  *    contract).
  *
  * Scale posture: planInputPartitions is listing-sized driver work (the
  * bounded-control-table exception); all data bytes move inside readers.
  * At 100 TB the chunk list shards into `chunksPerSplit` ranges, so task
  * count tracks corpus size while each task streams its chunks
  * sequentially — the same shape as Spark's own file sources. */
class CorpusSourceV2 extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-corpus"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CorpusSourceV2.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft-corpus needs a path: spark.read.format(...).option(\"path\", dir)")
    new CorpusTable(path,
      Option(properties.get("chunksPerSplit")).map(_.toInt).getOrElse(4))
  }
}

object CorpusSourceV2 {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Columns the reader can evaluate BEFORE materializing a row (text
    * would force the base64 decode, so predicates on it stay residual). */
  private val PushableCols = Set("doc_id", "source", "lang")

  private[sources] def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: In | _: IsNotNull =>
      f.references.forall(PushableCols)
    case _ => false
  }

  /** Sorted chunk listing — THE cursor space. Names sort lexically, so
    * zero-padded chunk names enumerate in write order. */
  private[sources] def listChunks(path: String,
                                  conf: org.apache.hadoop.conf.Configuration)
      : Array[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("chunk_"))
      .map(_.getPath.toString).sorted.toArray
  }

  /** Numeric index of a chunk file name (`chunk_00042.tsv` → 42). */
  private[sources] def chunkIndex(name: String): Long =
    name.stripPrefix("chunk_").takeWhile(_.isDigit) match {
      case "" => -1L
      case digits => digits.toLong
    }

  /** The session's hadoop conf, serializable for executor-side use —
    * captured at DRIVER-side construction points so `spark.hadoop.*`
    * settings (object-store credentials, custom fs impls) reach readers,
    * writers, and the driver-side commit instead of being silently
    * dropped by a `new Configuration()`. */
  private[sources] def sessionConf()
      : org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())

  /** Stage a documents frame into the chunk format through the
    * connector's OWN DSv2 write path (two-phase task-staged commit — see
    * [[CorpusBatchWrite]]): `chunks` zero-padded files, rows
    * range-partitioned by doc_id so chunk content and order are
    * deterministic; overwrite mode truncates a prior staging. */
  def stage(docs: DataFrame, dir: String, chunks: Int = 8): Unit =
    docs.select(col("doc_id"), col("source"), col("lang"), col("text"))
      .repartitionByRange(chunks, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.format("graft-corpus").option("path", dir)
      .mode("overwrite").save()
}

private[sources] class CorpusTable(path: String, chunksPerSplit: Int)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-corpus($path)"
  override def schema(): StructType = CorpusSourceV2.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CorpusScanBuilder(path, chunksPerSplit, CorpusSourceV2.sessionConf())
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val got = info.schema().fieldNames.toSeq
    val want = CorpusSourceV2.Schema.fieldNames.toSeq
    require(got.toSet == want.toSet,
      s"graft-corpus write needs columns $want, got $got")
    new CorpusWriteBuilder(path, info.schema(), CorpusSourceV2.sessionConf())
  }
}

private[sources] class CorpusWriteBuilder(
    path: String, schema: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends WriteBuilder with SupportsTruncate {
  private var replace = false
  override def truncate(): WriteBuilder = { replace = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new CorpusBatchWrite(path, schema, replace, conf)
  }
}

/** Per-task staged file + commit message — the standard two-phase write:
  * tasks produce `_wstage_*` files invisible to readers (the chunk
  * listing only admits `chunk_*`); the DRIVER's commit renames them to
  * monotone chunk names in (partition, task) order, so a failed or
  * speculatively-duplicated task attempt never becomes visible and the
  * job is all-or-nothing — K2's contract, expressed through the DSv2
  * commit protocol itself. */
private[sources] case class CorpusCommitMsg(partitionId: Int, taskId: Long,
                                            staged: String, rows: Long)
    extends WriterCommitMessage

private[sources] class CorpusBatchWrite(
    path: String, schema: StructType, replace: Boolean,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CorpusWriterFactory(path, schema, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(conf.value)
    if (replace) { // overwrite mode: retire the previous corpus first
      if (fs.exists(root)) fs.listStatus(root).toSeq.foreach { st =>
        if (st.isFile && st.getPath.getName.startsWith("chunk_"))
          fs.delete(st.getPath, false)
      }
    }
    // next index = max surviving index + 1, NOT the listing length — a
    // non-contiguous chunk set (a deleted chunk) must never make a new
    // name collide with a surviving chunk
    val base = CorpusSourceV2.listChunks(path, conf.value)
      .map(c => CorpusSourceV2.chunkIndex(new Path(c).getName))
      .foldLeft(-1L)(math.max) + 1L
    val staged = messages.collect { case m: CorpusCommitMsg => m }
      .filter(_.rows > 0)
      .sortBy(m => (m.partitionId, m.taskId))
    staged.zipWithIndex.foreach { case (m, i) =>
      require(fs.rename(new Path(m.staged),
        new Path(root, f"chunk_${base + i}%05d.tsv")),
        s"commit rename failed for ${m.staged}")
    }
    // sweep any orphaned staging (failed attempts whose abort never ran)
    if (fs.exists(root)) fs.listStatus(root).toSeq.foreach { st =>
      if (st.isFile && st.getPath.getName.startsWith("_wstage_"))
        fs.delete(st.getPath, false)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.collect { case m: CorpusCommitMsg => m }
      .foreach(m => fs.delete(new Path(m.staged), false))
  }
}

private[sources] class CorpusWriterFactory(
    path: String, schema: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CorpusChunkWriter(path, schema, partitionId, taskId, conf)
}

private[sources] class CorpusChunkWriter(
    path: String, schema: StructType, partitionId: Int, taskId: Long,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends DataWriter[InternalRow] {
  // column positions in the INCOMING row for each output field
  private val pos = Array("doc_id", "source", "lang", "text")
    .map(n => schema.fieldNames.indexOf(n))
  private val staged =
    s"$path/_wstage_p${partitionId}_t$taskId"
  private var out: java.io.Writer = _
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    if (out == null) { // lazy: empty partitions produce no chunk
      val p = new Path(staged)
      val fs = p.getFileSystem(conf.value)
      out = new java.io.OutputStreamWriter(fs.create(p, true),
        java.nio.charset.StandardCharsets.UTF_8)
    }
    val docId = row.getLong(pos(0))
    val source = row.getUTF8String(pos(1)).toString
    val lang = row.getUTF8String(pos(2)).toString
    val text = Base64.getEncoder.encodeToString(
      row.getUTF8String(pos(3)).getBytes)
    out.write(s"$docId\t$source\t$lang\t$text\n")
    rows += 1L
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    CorpusCommitMsg(partitionId, taskId, staged, rows)
  }
  override def abort(): Unit = {
    if (out != null) out.close()
    val p = new Path(staged)
    p.getFileSystem(conf.value).delete(p, false)
  }
  override def close(): Unit = if (out != null) { out.close(); out = null }
}

private[sources] class CorpusScanBuilder(
    path: String, chunksPerSplit: Int,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = CorpusSourceV2.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(CorpusSourceV2.supported)
    pushed = sup
    residual // Spark keeps evaluating these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }
  override def build(): Scan =
    new CorpusScan(path, chunksPerSplit, required, pushed, conf)
}

private[sources] class CorpusScan(
    path: String, chunksPerSplit: Int,
    val required: StructType, val pushed: Array[Filter],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends Scan {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-corpus($path) ReadSchema: ${required.fieldNames.mkString(",")} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def toBatch: Batch =
    new CorpusBatch(path, chunksPerSplit, required, pushed, conf)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CorpusMicroBatchStream(path, required, pushed, conf)
}

/** One cursor range of chunks — the unit of parallelism. */
private[sources] case class CorpusRange(chunks: Array[String])
    extends InputPartition

private[sources] class CorpusBatch(
    path: String, chunksPerSplit: Int,
    required: StructType, pushed: Array[Filter],
    conf: org.apache.spark.util.SerializableConfiguration) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    CorpusSourceV2.listChunks(path, conf.value)
      .grouped(math.max(1, chunksPerSplit)).map(CorpusRange(_)).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CorpusReaderFactory(required, pushed, conf)
}

private[sources] class CorpusMicroBatchStream(
    path: String, required: StructType, pushed: Array[Filter],
    sconf: org.apache.spark.util.SerializableConfiguration)
    extends MicroBatchStream {
  private def conf = sconf.value

  override def initialOffset(): Offset = CorpusOffset("")
  override def latestOffset(): Offset = {
    val names = CorpusSourceV2.listChunks(path, conf)
      .map(c => new Path(c).getName)
    CorpusOffset(if (names.isEmpty) "" else names.last)
  }
  override def deserializeOffset(json: String): Offset = {
    val byName = """"watermark"\s*:\s*"([^"]*)"""".r
      .findFirstMatchIn(json).map(_.group(1))
    byName match {
      case Some(w) => CorpusOffset(w)
      case None =>
        // LEGACY checkpoint (round-11 format {"chunks":N} — a consumed-
        // chunk COUNT): translate to the name watermark of the N-th
        // sorted chunk, exactly what that checkpoint had consumed.
        // Mapping it to "" would silently re-read every chunk and
        // duplicate rows in the sink; an unrecognized format fails loudly
        // instead.
        val legacy = """"chunks"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
          .map(_.group(1).toInt).getOrElse(
            throw new IllegalStateException(
              s"unrecognized corpus-source offset $json — neither the " +
                "name-watermark format nor the legacy chunk-count format"))
        if (legacy <= 0) CorpusOffset("")
        else {
          val names = CorpusSourceV2.listChunks(path, conf)
            .map(c => new Path(c).getName)
          require(legacy <= names.length,
            s"legacy offset counts $legacy chunks but only " +
              s"${names.length} exist — cannot translate the checkpoint")
          CorpusOffset(names(legacy - 1))
        }
    }
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CorpusOffset].watermark
    val e = end.asInstanceOf[CorpusOffset].watermark
    // exactly the chunks in (start, end] by NAME — immune to a chunk
    // sorting before the watermark (it is never re-read or counted)
    val chunks = CorpusSourceV2.listChunks(path, conf)
      .filter { c =>
        val n = new Path(c).getName
        n > s && n <= e
      }
    // one partition per chunk: a micro-batch is usually few chunks, and
    // per-chunk tasks keep replay granularity aligned with the cursor
    chunks.map(c => CorpusRange(Array(c)): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CorpusReaderFactory(required, pushed, sconf)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The high-watermark offset — the persisted continuation cursor: the
  * NAME of the last consumed chunk ("" = nothing consumed yet). */
private[sources] case class CorpusOffset(watermark: String) extends Offset {
  override def json(): String = s"""{"watermark":"$watermark"}"""
}

private[sources] class CorpusReaderFactory(
    required: StructType, pushed: Array[Filter],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CorpusReader(partition.asInstanceOf[CorpusRange].chunks, required,
      pushed, conf)
}

private[sources] class CorpusReader(
    chunks: Array[String], required: StructType, pushed: Array[Filter],
    sconf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private def conf = sconf.value
  private var chunkIdx = 0
  private var lines: java.util.Iterator[String] = java.util.Collections.emptyIterator()
  private var reader: java.io.BufferedReader = _
  private var current: InternalRow = _

  // required-column projection compiled once: field name -> extractor
  private val fieldIdx = required.fieldNames.map {
    case "doc_id" => 0
    case "source" => 1
    case "lang" => 2
    case "text" => 3
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }
  private val needText = fieldIdx.contains(3)

  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (chunkIdx >= chunks.length) return false
    val p = new Path(chunks(chunkIdx))
    chunkIdx += 1
    val fs: FileSystem = p.getFileSystem(conf)
    reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), java.nio.charset.StandardCharsets.UTF_8))
    lines = reader.lines().iterator()
    true
  }

  /** Pushed-filter evaluation against the parsed key columns — runs
    * BEFORE text decode and row materialization. */
  private def passes(docId: Long, source: String, lang: String): Boolean = {
    def v(attr: String): Any = attr match {
      case "doc_id" => docId
      case "source" => source
      case "lang" => lang
    }
    def cmp(attr: String, x: Any): Int = (v(attr), x) match {
      case (a: Long, b: Number) => java.lang.Long.compare(a, b.longValue())
      case (a: String, b) => a.compareTo(b.toString)
      case _ => throw new IllegalArgumentException(s"uncomparable $attr")
    }
    pushed.forall {
      case EqualTo(a, x) => cmp(a, x) == 0
      case GreaterThan(a, x) => cmp(a, x) > 0
      case GreaterThanOrEqual(a, x) => cmp(a, x) >= 0
      case LessThan(a, x) => cmp(a, x) < 0
      case LessThanOrEqual(a, x) => cmp(a, x) <= 0
      case In(a, xs) => xs.exists(x => cmp(a, x) == 0)
      case IsNotNull(_) => true // the format admits no nulls
      case f => throw new IllegalStateException(s"unpushable filter $f")
    }
  }

  override def next(): Boolean = {
    while (true) {
      if (lines.hasNext) {
        val line = lines.next()
        if (line.nonEmpty) {
          // split into at most 4 fields; the base64 payload has no tabs
          val f = line.split("\t", 4)
          val docId = f(0).toLong
          if (passes(docId, f(1), f(2))) {
            current = InternalRow.fromSeq(fieldIdx.toSeq.map {
              case 0 => docId
              case 1 => UTF8String.fromString(f(1))
              case 2 => UTF8String.fromString(f(2))
              case 3 => UTF8String.fromBytes(Base64.getDecoder.decode(f(3)))
            })
            return true
          }
        }
      } else if (!openNext()) return false
    }
    false // unreachable
  }
  override def get(): InternalRow = current
  override def close(): Unit = if (reader != null) reader.close()
}
