package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) clustering, the standard
  * technique for making a 100 TB table prunable on MORE than one column.
  * Range-partitioning on a single key clusters one dimension and scatters
  * every other; interleaving the bits of several quantized keys gives a
  * space-filling curve whose ranges are small hyper-rectangles, so parquet
  * row-group min/max statistics prune scans filtered on ANY prefix of the
  * interleaved dimensions.
  *
  * Pipeline shape: one agg job for per-column min/max (2×|cols| scalars to
  * the driver — same bounded pattern as k-means centroids), then a pure
  * codegen projection (shift/mask interleave, no UDF) and ONE range
  * repartition on the z-value. Nothing here is quadratic or key-skew-bound;
  * the range exchange's sampling handles skewed z-distributions.
  *
  * The linear min/max quantizer is deliberate: it is reproducible by any
  * other engine (the DuckDB oracle reproduces z-values bit-for-bit via the
  * same IEEE-double expression). Swapping in a quantile-based quantizer
  * (approxQuantile boundaries, broadcast) changes only [[quantize]].
  */
object Layout {

  /** Interleave the low `bits` bits of pre-quantized non-negative long
    * columns: column j contributes its bit i at output position
    * `i * |cols| + j` — column 0 owns the least-significant lane. Pure
    * shift/mask arithmetic inside whole-stage codegen; |cols|×bits must be
    * ≤ 63.
    */
  def zValue(qcols: Seq[Column], bits: Int): Column = {
    require(qcols.nonEmpty && bits > 0 && qcols.size * bits <= 63,
      s"need 0 < cols*bits <= 63, got ${qcols.size} cols x $bits bits")
    (0 until bits).flatMap { i =>
      qcols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * qcols.size + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Linear quantizer: map a long column with known [mn, mx] onto
    * [0, 2^bits − 1]. The `least` clamp covers the c = mx endpoint (the
    * double ratio can round up to exactly 2^bits − 1 + ε only at the top).
    * Degenerate mn = mx collapses to bucket 0.
    */
  def quantize(c: Column, mn: Long, mx: Long, bits: Int): Column = {
    val mask = (1L << bits) - 1
    if (mx == mn) lit(0L)
    else least(
      floor((c - lit(mn)).cast("double") * lit(mask.toDouble) /
        lit((mx - mn).toDouble)),
      lit(mask)).cast("long")
  }

  /** Z-order `df` on long columns `cols`: quantize each to `bits` bits
    * against its global min/max (one agg job), append the interleaved
    * `zval`, and range-repartition + locally sort on it — the frame is
    * ready for a clustered parquet write whose row groups are z-curve
    * segments. Returns the clustered frame with `zval` retained so callers
    * (and the correctness gate) can inspect the curve position.
    */
  def zOrder(df: DataFrame, cols: Seq[String], bits: Int = 8,
      partitions: Int = 0): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")).as(s"mn_$c"),
        max(col(c).cast("long")).as(s"mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    if (row.isNullAt(0)) return df.withColumn("zval", lit(0L)) // empty input
    val q = cols.zipWithIndex.map { case (c, i) =>
      quantize(col(c).cast("long"), row.getLong(2 * i), row.getLong(2 * i + 1),
        bits)
    }
    val out = df.withColumn("zval", zValue(q, bits))
    val parts = if (partitions > 0) partitions
      else out.sparkSession.sessionState.conf.numShufflePartitions
    out.repartitionByRange(parts, col("zval")).sortWithinPartitions("zval")
  }

  /** BUCKETED co-located join — the zero-shuffle big-big join: both sides
    * are written `bucketBy(n, key)` once (the layout investment), after
    * which EVERY subsequent equi-join or aggregation on that key plans
    * with no Exchange on either side — at 100 TB this converts the
    * recurring dominant cost of a fact-fact join (two full-corpus
    * shuffles, every run) into a one-time clustered write. The Spark-native
    * form of the co-partitioning the reference's manual 20-way fan-out
    * gestures at: the bucket spec lives in the table metadata, so Catalyst
    * proves co-partitioning statically and elides both exchanges
    * (`PlanSpec` asserts the plan).
    *
    * `prepare` writes the two frames as bucketed tables (overwrite —
    * idempotent); `join` reads them back and equi-joins on the bucket key.
    * Sized so |buckets| ≈ shuffle parallelism; at scale, match bucket
    * count across tables that join together (Spark requires equal or
    * multiple counts to elide the exchange).
    */
  /** Zone-map ledger: per-`block` row count and min/max per stat column —
    * the file/row-group statistics a lakehouse stores in its manifest so a
    * query planner can skip whole blocks without opening them. One hash
    * aggregation producing |blocks| rows (metadata-sized); on a z-ordered
    * layout ([[zOrder]]) each block is a z-curve segment, so the min/max
    * boxes are tight hyper-rectangles and multi-column predicates prune.
    */
  def zoneMap(df: DataFrame, blockCol: Column,
      statCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: statCols.flatMap(c =>
      Seq(min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c")))
    df.groupBy(blockCol.as("block")).agg(aggs.head, aggs.tail: _*)
  }

  /** MERGE zone-map ledgers — statistics maintenance under APPEND: when a
    * new commit lands, its delta ledger folds into the standing one
    * (counts add, mins min, maxes max — all associative), so the manifest
    * stats update at delta cost instead of a full-table rescan.
    * `zoneMapMerge(zoneMap(A), zoneMap(B)) ≡ zoneMap(A ∪ B)` exactly, for
    * any split (spec- and gate-pinned). Input/output are metadata-sized.
    */
  def zoneMapMerge(ledgers: Seq[DataFrame], statCols: Seq[String])
      : DataFrame = {
    require(ledgers.nonEmpty)
    val aggs = sum(col("n_rows")).as("n_rows") +: statCols.flatMap(c =>
      Seq(min(col(s"mn_$c")).as(s"mn_$c"), max(col(s"mx_$c")).as(s"mx_$c")))
    ledgers.reduce(_.unionAll(_))
      .groupBy(col("block")).agg(aggs.head, aggs.tail: _*)
  }

  /** Evaluate a conjunctive range predicate against a [[zoneMap]]:
    * `scanned` = the block's [mn, mx] box overlaps EVERY predicate range —
    * exactly the min/max test parquet readers and table-format planners
    * run; the false rows are the I/O a 100 TB scan never performs.
    */
  def pruneFlag(zm: DataFrame,
      preds: Seq[(String, Long, Long)]): DataFrame = {
    require(preds.nonEmpty, "pruneFlag needs at least one predicate")
    zm.withColumn("scanned", preds.map { case (c, lo, hi) =>
      col(s"mx_$c") >= lit(lo) && col(s"mn_$c") <= lit(hi)
    }.reduce(_ && _))
  }

  def bucketedPrepare(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    // the in-memory catalog forgets tables across JVMs while the warehouse
    // directory persists — clear BOTH or a later session's create hits
    // LOCATION_ALREADY_EXISTS
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Hive-style partitioned layout: write `df` once partitioned by
    * `partCol`'s directory values, read it back as a partitioned relation.
    * A filter on the partition column then prunes at PLANNING time — the
    * listing never touches the skipped directories, so a day-filtered scan
    * of a 100 TB table opens only that day's files (PlanSpec pins
    * `PartitionFilters` on the scan). The write repartitions on the
    * partition column first so each directory is written by the tasks
    * that own it — without it every task writes every partition and a
    * 1000-executor write creates tasks×partitions small files.
    */
  def partitionedPrepare(df: DataFrame, path: String,
      partCol: String): DataFrame = {
    val spark = df.sparkSession
    df.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)
    spark.read.parquet(path)
  }

  /** Small-file COMPACTION planning — the lakehouse maintenance pass that
    * turns a partition's shard of tiny files into ~`targetBytes` rewrite
    * groups. Input is the FILE INVENTORY (one row per file with its
    * partition, id and size — metadata-sized, millions of rows for a
    * 100 TB table, never the data). Files are packed next-fit in id order:
    * each file's group is `floor(bytes_before_it / target)` from a
    * per-partition prefix sum, so group boundaries never depend on how the
    * inventory was partitioned and every group except the last holds at
    * least `target` bytes once its last member lands (a file may straddle
    * — compaction rewrites it anyway). One window sort per partition of an
    * inventory relation ⇒ the plan costs seconds where the rewrite it
    * schedules costs hours; the rewrite itself is then
    * `repartitionByRange` on (partition, group).
    */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val w = Window.partitionBy(partCol).orderBy(fileCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    files.select(col(partCol), col(fileCol), col(sizeCol).as("size_bytes"))
      .withColumn("grp",
        floor(coalesce(sum(col("size_bytes")).over(w), lit(0L)) /
          lit(targetBytes)))
  }

  // ----------------------------------------------------------- bloom index

  /** The bloom hash family shared by [[bloomLedger]] and [[bloomProbe]] —
    * plain modular arithmetic (NOT murmur/xxhash) so any engine, any
    * language reproduces the bit positions exactly: position(key, seed) =
    * ((key mod P)·(31 + 2·seed) + 1000003·seed) mod P mod m, P = 1e9+7.
    * All intermediates fit int64 under ANSI arithmetic.
    */
  private val bloomP = 1000000007L

  private def bloomPositions(key: Column, mBits: Int, k: Int): Column =
    transform(sequence(lit(0L), lit(k - 1L)), seed =>
      (pmod(key, lit(bloomP)) * (lit(31L) + seed * 2L) +
        seed * lit(1000003L)) % bloomP % mBits)

  /** Per-block BLOOM LEDGER — the point-lookup companion to [[zoneMap]]'s
    * range pruning: zone maps skip blocks by min/max, a bloom index skips
    * blocks that provably don't contain a key (no false negatives, bounded
    * false positives). Delta calls this a bloom filter index; here it is
    * built as a plain aggregation — k positions per row (row-local
    * transform + explode), one hash agg to |blocks| rows holding the
    * distinct-position set. Metadata-sized output (≤ mBits ints per
    * block), broadcastable next to the file manifest.
    */
  def bloomLedger(df: DataFrame, blockCol: Column, keyCol: Column,
      mBits: Int = 1024, k: Int = 4): DataFrame = {
    require(mBits > 0 && k > 0, s"need mBits>0, k>0; got $mBits, $k")
    val counts = df.groupBy(blockCol.as("block"))
      .agg(count(lit(1)).as("n_rows"))
    df.select(blockCol.as("block"),
        explode(bloomPositions(keyCol, mBits, k)).as("pos"))
      .groupBy("block")
      .agg(array_sort(collect_set(col("pos"))).as("bloom"))
      .join(counts, "block")
      .select(col("block"), col("n_rows"), col("bloom"),
        size(col("bloom")).cast("long").as("n_bits_set"))
  }

  /** Candidate blocks per probe key: a block survives iff ALL k of the
    * key's positions are set in its bloom. The ledger side is
    * metadata-sized; probes broadcast against it — the scan this index
    * exists to avoid never happens here.
    */
  def bloomProbe(ledger: DataFrame, probes: DataFrame, keyCol: String,
      mBits: Int = 1024, k: Int = 4): DataFrame = {
    val pp = probes.select(col(keyCol),
      bloomPositions(col(keyCol), mBits, k).as("__pp"))
    ledger.join(broadcast(pp),
        forall(col("__pp"), p => array_contains(col("bloom"), p)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_candidate_blocks"))
  }

  // ------------------------------------------------------------ time travel

  /** Minimal manifest-based snapshot versioning — the mechanism beneath
    * Delta/Iceberg time travel, built from parquet + a JSON file list (no
    * table-format jars exist in this environment, and none are needed for
    * the semantics): each commit appends immutable data files under
    * `dir/v<N>/` and writes `dir/_manifests/v<N>.json` naming EVERY file
    * visible at that version (the parent manifest's list plus the new
    * files). Reading version N lists the manifest (driver-side,
    * metadata-sized) and hands exactly those files to the parquet scan —
    * no directory listing, no tombstones, and old versions stay readable
    * forever because data files are never rewritten in place.
    */
  def commitVersion(df: DataFrame, dir: String, version: Int): Unit = {
    import java.nio.file.{Files, Paths}
    val dataDir = s"$dir/v$version"
    df.write.mode("errorifexists").parquet(dataDir)
    val newFiles = listParquetFiles(dataDir)
    val parent = Paths.get(s"$dir/_manifests/v${version - 1}.json")
    val inherited =
      if (Files.exists(parent)) readManifest(parent.toString) else Nil
    val all = inherited ++ newFiles
    writeManifestAtomic(dir, version, all)
  }

  /** REWRITE commit (the OPTIMIZE/compaction path): version N's manifest
    * points ONLY at the freshly written files — logically the same rows,
    * physically re-laid-out (fewer/larger files, new sort order). Old
    * versions keep reading their own manifests untouched; nothing is
    * deleted, so time travel across the rewrite stays exact. The caller
    * passes the compacted DataFrame (e.g. `readVersion(N-1)` re-sorted /
    * coalesced per [[compactionPlan]]).
    */
  def commitRewrite(df: DataFrame, dir: String, version: Int): Unit = {
    import java.nio.file.{Files, Paths}
    val dataDir = s"$dir/v$version"
    df.write.mode("errorifexists").parquet(dataDir)
    val newFiles = listParquetFiles(dataDir)
    writeManifestAtomic(dir, version, newFiles)
  }

  /** The manifest IS the commit point (consumers like the versioned-ingest
    * retry path treat its existence as "version committed"), so it must
    * appear all-or-nothing: write to a temp sibling, then ATOMIC_MOVE into
    * place — a crash mid-write leaves only the temp file, never a torn
    * manifest that a retry would mistake for a completed commit.
    */
  private def writeManifestAtomic(dir: String, version: Int,
      files: Seq[String]): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.createDirectories(Paths.get(s"$dir/_manifests"))
    val tmp = Paths.get(s"$dir/_manifests/.v$version.json.tmp")
    Files.writeString(tmp,
      files.map(p => "\"" + p.replace("\\", "\\\\").replace("\"", "\\\"") +
        "\"").mkString("[", ",", "]"))
    Files.move(tmp, Paths.get(s"$dir/_manifests/v$version.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Sorted .parquet paths under `dataDir` — the Files.list stream is
    * closed in a finally (it holds a directory fd until closed).
    */
  private def listParquetFiles(dataDir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(dataDir))
    try s.iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq.sorted
    finally s.close()
  }

  private def readManifest(path: String): Seq[String] = {
    val raw = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    // Files are written by commitVersion with no control chars in names;
    // a flat quoted-string array parse is exact for that alphabet.
    "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(raw)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
  }

  /** Read snapshot version N as of its manifest (see [[commitVersion]]). */
  def readVersion(spark: org.apache.spark.sql.SparkSession, dir: String,
      version: Int): DataFrame = {
    val files = readManifest(s"$dir/_manifests/v$version.json")
    require(files.nonEmpty, s"empty manifest for $dir v$version")
    spark.read.parquet(files: _*)
  }
}
