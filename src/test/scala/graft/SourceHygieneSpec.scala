package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Control-byte lint over the source tree.
  *
  * A raw control byte (NUL in particular) inside a .scala file makes
  * grep/ripgrep classify the file as BINARY and silently skip it in
  * every source search — the file becomes invisible to audits while
  * still compiling fine. This defect class shipped twice (KernelCache
  * r15, AutoSaltRule r16: a `"\\u0000<null>"` sentinel written as the
  * raw byte instead of the escape), so it is now a red test, not a
  * review convention: any byte below 0x09 (i.e. anything but TAB, LF,
  * CR and printable text) in any tracked .scala file fails the suite.
  */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaFiles(root: String): Seq[Path] = {
    val base = Paths.get(root)
    if (!Files.exists(base)) Seq.empty
    else Files.walk(base).iterator().asScala
      .filter(p => p.toString.endsWith(".scala") && Files.isRegularFile(p))
      .toSeq
  }

  test("no control bytes below 0x09 in any src/**/*.scala") {
    val offenders = for {
      root <- Seq("src/main", "src/test")
      file <- scalaFiles(root)
      bytes = Files.readAllBytes(file)
      idx = bytes.indexWhere(b => b >= 0 && b < 0x09)
      if idx >= 0
    } yield s"$file: byte 0x${"%02x".format(bytes(idx))} at offset $idx"
    assert(offenders.isEmpty,
      s"raw control bytes make files grep-invisible:\n${offenders.mkString("\n")}")
  }

  test("lint detects a planted NUL (self-check)") {
    // The lint predicate itself, applied to a buffer with a raw NUL —
    // guards against the check rotting into an always-green walk.
    val planted = "val k = \"".getBytes("UTF-8") ++ Array[Byte](0x00) ++ "<null>\"".getBytes("UTF-8")
    assert(planted.indexWhere(b => b >= 0 && b < 0x09) >= 0)
  }
}
