package graft.catalog

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Directory listing that CLOSES the JDK stream. `Files.list(dir)
  * .iterator().asScala` keeps the directory file descriptor open until
  * the stream is garbage-collected — per metadata load / commit / reap
  * that is one leaked fd, and a long-lived driver serving many commits
  * (or one full test run: 13k+ leaked metadata-dir handles observed)
  * exhausts its fd limit with `Too many open files` failures that look
  * like storage errors. Every directory enumeration in the engine goes
  * through here.
  */
object Fs {

  /** The directory's entries, stream closed. Order is filesystem order
    * — sort at the call site when determinism matters. */
  def children(dir: Path): Vector[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toVector
    finally s.close()
  }

  /** Entry file names (no parent path), stream closed. */
  def childNames(dir: Path): Vector[String] =
    children(dir).map(_.getFileName.toString)

  /** Recursive walk (dir itself included), stream closed. */
  def walk(dir: Path): Vector[Path] = {
    val s = Files.walk(dir)
    try s.iterator().asScala.toVector
    finally s.close()
  }

  /** Best-effort recursive delete (children before parents); a no-op
    * for a missing dir. The one home for the walk-reverse-delete idiom
    * every staging/reap site used to hand-roll. */
  def deleteRecursively(dir: Path): Unit =
    if (Files.exists(dir))
      walk(dir).reverse.foreach(Files.deleteIfExists(_))
}
