package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Filename-policy machinery — reference `filename-policy`
  * (core.clj:2157-2209) and the text-writer `:prefix/:suffix/:naming-fn`
  * options (core.clj:1219-1253).
  *
  * Spark's committer owns in-flight filenames, so a filename policy is
  * applied as a post-commit staged rename of the committer's `part-*`
  * output. The rename sequence (proven first in the windowed sink,
  * streaming/Sources.scala) is shared between batch and streaming:
  *
  * A re-emission (batch overwrite replay, or a refined streaming pane)
  * may carry a DIFFERENT shard count than the previous emission —
  * exact-name replacement would leave stale `prefix-i-of-oldN` files
  * beside the new set, and a reader globbing the prefix would
  * double-count. So: (1) stage the new shards into the target dir under
  * dot-temp names (hidden from globs), (2) delete the ENTIRE previous
  * emission matching `cleanupGlob`, (3) same-dir rename temp → final
  * (each rename atomic). A crash mid-sequence leaves either the old
  * emission intact or only hidden temps; a replayed write redoes the
  * rename either way.
  */
object FileNaming {

  /** Default shard-naming policy, `prefix-00000-of-00002.suffix` — the
    * reference's `mk-default-unwindowed-fn` (core.clj:2170-2176)
    * modulo zero-padding (stable lexicographic ordering at any shard
    * count, same convention as the windowed sink). */
  def defaultName(prefix: String, suffix: String)(shard: Int, of: Int): String =
    f"$prefix-$shard%05d-of-$of%05d$suffix"

  /** Rename the committed `part-*` files under `srcDir` into `destDir`
    * as `nameFor(shardIndex, shardCount)`, with the crash-safe staged
    * sequence documented above; deletes `srcDir` when done and returns
    * the final paths in shard order.
    *
    * `cleanupGlob` names the previous emission to replace (e.g.
    * `prefix-*suffix`); pass None with a custom naming fn whose output
    * shape can't be globbed — then only exact-name targets are
    * replaced, and a shrink in shard count can strand old tails (the
    * same contract Beam's custom FileNaming has). `stageTag` makes the
    * hidden temp names unique per emission (batch id, window, …). */
  def stagedRename(conf: Configuration, srcDir: String, destDir: String,
                   nameFor: (Int, Int) => String,
                   cleanupGlob: Option[String],
                   stageTag: String): Seq[String] = {
    val src = new Path(srcDir)
    val fs = FileSystem.get(src.toUri, conf)
    val dest = new Path(destDir)
    if (!fs.exists(dest)) fs.mkdirs(dest)
    val parts = Option(fs.globStatus(new Path(src, "part-*")))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .sortBy(_.getPath.getName)
    val n = parts.length
    // (1) stage under hidden names in the destination dir
    val staged = parts.zipWithIndex.map { case (st, i) =>
      val finalName = nameFor(i, n)
      val pending = new Path(dest, s".pending-$stageTag-$finalName")
      if (fs.exists(pending)) fs.delete(pending, false)
      if (!fs.rename(st.getPath, pending))
        throw new java.io.IOException(s"rename ${st.getPath} -> $pending failed")
      (pending, new Path(dest, finalName))
    }
    // (2) drop the previous emission wholesale
    cleanupGlob.foreach { g =>
      Option(fs.globStatus(new Path(dest, g)))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
        .foreach(st => fs.delete(st.getPath, false))
    }
    // exact-name replacement for targets the glob didn't cover
    staged.foreach { case (_, target) =>
      if (fs.exists(target)) fs.delete(target, false)
    }
    // (3) same-dir rename into place, each atomic
    staged.foreach { case (pending, target) =>
      if (!fs.rename(pending, target))
        throw new java.io.IOException(s"rename $pending -> $target failed")
    }
    fs.delete(src, true)
    staged.map(_._2.toString).toIndexedSeq
  }
}
