package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recomputes the fixture manifest (byte count + MD5 + row count per
  * sf0.001/sf0.01 parquet file) and compares it byte-for-byte against
  * the committed `tools/testdata_manifest.json` — the reproducibility
  * pin under every "green at sfX" claim. A mismatch means the fixture
  * trees are not the ones the evidence chain was recorded against.
  */
class TestdataManifestSpec extends AnyFunSuite {
  test("sf0.001 and sf0.01 fixture trees match the committed manifest") {
    assume(new java.io.File(s"${graft.tools.TestdataManifest.Base}/sf0.001")
      .isDirectory, "no fixture tree on this machine")
    val committedPath = java.nio.file.Paths
      .get(graft.tools.TestdataManifest.ManifestPath)
    assert(java.nio.file.Files.exists(committedPath),
      s"$committedPath missing — run `sbt \"runMain graft.tools.TestdataManifest\"` and commit it")
    val committed = java.nio.file.Files.readString(committedPath)
    val actual = graft.tools.TestdataManifest.render(TestSpark.spark)
    assert(actual == committed,
      "fixture drift: recomputed manifest differs from the committed one")
  }
}
