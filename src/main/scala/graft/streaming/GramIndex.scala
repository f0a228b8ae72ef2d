package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Append-only, epoch-keyed parquet KEY INDEX shared by the dedup-at-ingest
  * streaming operators ([[StreamingSpanDedup]] excision,
  * [[StreamingNovelty]] admission scoring): one compact row per distinct
  * key ever seen, on distributed storage — never the state store or the
  * driver. Contracts the callers rely on:
  *
  *  - [[read]] returns only epochs strictly BEFORE the given one: a
  *    retried epoch must not probe its own half-written append, or every
  *    within-batch first occurrence would read as "seen";
  *  - [[append]] overwrites the epoch's own directory — a retried epoch is
  *    idempotent;
  *  - [[compact]] folds finished epoch dirs into one `compact_` dir every
  *    `compactEvery` epochs via tmp-write → atomic same-fs rename → delete,
  *    crash-safe at every step (a double-read after a crash is absorbed
  *    because index rows are set-like and probes are semi-joins). The live
  *    directory count stays ≤ compactEvery + the current epoch's append.
  */
private[streaming] final class GramIndex(spark: SparkSession, dir: Path,
    schema: StructType, compactEvery: Int) {

  private val dirEpoch = raw".*/(?:epoch|compact)_(\d+)$$".r

  private def epochOf(p: String): Option[Long] = p match {
    case dirEpoch(e) => Some(e.toLong)
    case _ => None
  }

  private def epochDirs(): Seq[String] = {
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.toString).toList.sorted finally s.close()
  }

  private def deleteDir(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.deleteIfExists(_))
    finally s.close()
  }

  /** All keys appended by epochs strictly before `beforeEpoch`. */
  def read(beforeEpoch: Long): DataFrame = {
    val dirs = epochDirs().filter(epochOf(_).exists(_ < beforeEpoch))
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.parquet(dirs: _*)
  }

  /** Overwrite this epoch's append with `df` (the batch's new keys). */
  def append(df: DataFrame, epoch: Long): Unit =
    df.write.mode("overwrite").parquet(dir.resolve(f"epoch_$epoch%09d").toString)

  /** Fold finished epochs when the dir count reaches `compactEvery`. */
  def compact(epoch: Long): Unit = {
    epochDirs().filter(_.matches(raw".*/tmp_\d+$$"))
      .foreach(p => deleteDir(Path.of(p)))
    val dirs = epochDirs().filter(epochOf(_).exists(_ < epoch))
    if (dirs.length >= compactEvery) {
      val tmp = dir.resolve(f"tmp_${epoch - 1}%09d")
      val dst = dir.resolve(f"compact_${epoch - 1}%09d")
      if (Files.exists(dst)) {
        dirs.filterNot(_ == dst.toString).foreach(p => deleteDir(Path.of(p)))
      } else {
        spark.read.parquet(dirs: _*).distinct()
          .write.mode("overwrite").parquet(tmp.toString)
        Files.move(tmp, dst) // same-fs dir rename: atomic commit
        dirs.foreach(p => deleteDir(Path.of(p)))
      }
    }
  }
}
