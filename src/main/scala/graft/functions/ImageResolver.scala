package graft.functions

import graft.dialect.DialectException
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** IMAGE column support: resolves an identifier to an image file path
  * under a session-scoped image directory, mirroring the reference's
  * resolver (reference `pkg/handlers/insert.go:183-226`; `SET IMAGE DIR`
  * at `main.go:925-942`): exact `<id><ext>` match first, then substring
  * match over the directory listing.
  */
object ImageResolver {
  val extensions: Seq[String] =
    Seq(".jpg", ".jpeg", ".png", ".gif", ".bmp", ".tiff", ".webp")

  @volatile private var imageDir: Option[String] = None

  def setImageDir(dir: String): Unit = {
    if (!Files.isDirectory(Paths.get(dir)))
      throw DialectException(s"image directory does not exist: $dir")
    imageDir = Some(dir)
  }
  def getImageDir: Option[String] = imageDir

  /** Resolve an identifier to an absolute image path or fail. */
  def resolve(identifier: String): String = {
    val dir = imageDir.getOrElse(
      throw DialectException("image directory not set (SET IMAGE DIR <path>)"))
    val base = Paths.get(dir)
    // exact <id><ext>
    extensions.iterator
      .map(ext => base.resolve(identifier + ext))
      .find(Files.exists(_))
      .map(_.toAbsolutePath.toString)
      .orElse {
        // substring match over the listing
        val s = Files.list(base)
        try s.iterator.asScala
          .filter(p => extensions.exists(p.toString.toLowerCase.endsWith))
          .find(_.getFileName.toString.toLowerCase.contains(identifier.toLowerCase))
          .map(_.toAbsolutePath.toString)
        finally s.close()
      }
      .getOrElse(throw DialectException(s"image not found for identifier: $identifier"))
  }
}
