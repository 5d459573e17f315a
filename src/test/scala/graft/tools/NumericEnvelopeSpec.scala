package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The rule-11 audit: every registered envelope fits in long at its
  * documented operating bound, and the `Envelope:` scaladoc markers
  * and the registry are in bijection — a prose bound without an
  * entry (or an entry whose source lost its marker) fails here. */
class NumericEnvelopeSpec extends AnyFunSuite {

  private val srcRoot = new java.io.File("src/main/scala")

  private def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
    val (dirs, files) = dir.listFiles.toSeq.partition(_.isDirectory)
    files.filter(_.getName.endsWith(".scala")) ++
      dirs.flatMap(scalaFiles)
  }

  test("every registered envelope fits in a long at its operating bound") {
    NumericEnvelopes.all.foreach { e =>
      assert(e.worstAbs > 0, s"${e.name}: degenerate bound")
      assert(e.worstAbs <= BigInt(Long.MaxValue),
        s"${e.name} (${e.sourceFile}): worst |value| ${e.worstAbs} " +
          s"exceeds Long.MaxValue — widen to decimal(38) or tighten " +
          s"the documented bound: ${e.claim}")
    }
  }

  test("Envelope: scaladoc markers and the registry are in bijection") {
    val marked = scalaFiles(srcRoot)
      .filter { f =>
        val src = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        src.contains("Envelope:")
      }
      .map(_.getPath.replace(java.io.File.separatorChar, '/'))
      .filterNot(_.endsWith("tools/NumericEnvelopes.scala"))
      .toSet
    val registered = NumericEnvelopes.all.map(_.sourceFile).toSet
    assert(marked -- registered === Set.empty[String],
      "files with an Envelope: scaladoc bound but no registry entry")
    assert(registered -- marked === Set.empty[String],
      "registry entries whose source file lost its Envelope: marker")
  }

  test("registry names are unique and files exist") {
    val names = NumericEnvelopes.all.map(_.name)
    assert(names.distinct.size === names.size)
    NumericEnvelopes.all.foreach { e =>
      assert(new java.io.File(e.sourceFile).isFile,
        s"${e.name}: missing source file ${e.sourceFile}")
    }
  }
}
