package graft.extract

import graft.DedupConfig
import graft.functions.Xxh
import graft.sources.PagesGen
import org.scalatest.funsuite.AnyFunSuite

/**
 * E1 byte-stability golden pin (SURVEY.md §0.1.1): the extractor output per
 * url is FROZEN at v1 as xxhash64 digests. If this test fails you changed
 * extractor semantics — that breaks the byte-identical-extract invariant;
 * regenerate goldens ONLY together with the intended spec change, in one
 * commit (set GOLDEN_REGEN=1).
 */
class GoldenExtractSpec extends AnyFunSuite {
  private val cfg = DedupConfig.test
  private val N = 200
  private val goldenPath = java.nio.file.Paths.get("src/test/resources/golden_extract.csv")

  private def current(): Seq[(Long, Long)] =
    (0L until N.toLong).map { id =>
      val html = PagesGen.htmlFor(N, cfg.seed, id)
      id -> Xxh.hashString(HtmlExtract.extract(html), 42L)
    }

  test("extractor output matches pinned golden digests") {
    val now = current()
    if (sys.env.contains("GOLDEN_REGEN") || !java.nio.file.Files.exists(goldenPath)) {
      java.nio.file.Files.createDirectories(goldenPath.getParent)
      val body = "id,text_xxh64\n" + now.map { case (i, h) => s"$i,$h" }.mkString("\n") + "\n"
      java.nio.file.Files.writeString(goldenPath, body)
      fail(s"golden file (re)generated at $goldenPath — commit it and rerun")
    }
    val pinned = scala.io.Source.fromFile(goldenPath.toFile).getLines().drop(1).map { l =>
      val Array(i, h) = l.split(","); (i.toLong, h.toLong)
    }.toSeq
    assert(now === pinned,
      "extractor output drifted from the v1 frozen spec (see scaladoc)")
  }
}
