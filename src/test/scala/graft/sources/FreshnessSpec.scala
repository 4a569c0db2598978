package graft.sources

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import graft.SparkTestBase

class FreshnessSpec extends SparkTestBase {

  private def tmpFile(ageMillis: Long): String = {
    val f = Files.createTempFile("freshness", ".csv")
    Files.writeString(f, "a,b\n1,2\n")
    Files.setLastModifiedTime(f,
      FileTime.fromMillis(System.currentTimeMillis() - ageMillis))
    f.toString
  }

  test("fresh file is not stale; old file is") {
    val day = 24L * 60 * 60 * 1000
    val fresh = Freshness.warnFileAge(spark, tmpFile(0))
    assert(!fresh.stale && fresh.ageMillis < day)
    val old = Freshness.warnFileAge(spark, tmpFile(3 * day))
    assert(old.stale && old.ageMillis >= 3 * day - 60000)
  }

  test("directory age is the newest file beneath it") {
    val day = 24L * 60 * 60 * 1000
    val dir = Files.createTempDirectory("freshness_dir")
    val oldF = Paths.get(dir.toString, "old.csv")
    Files.writeString(oldF, "x")
    Files.setLastModifiedTime(oldF,
      FileTime.fromMillis(System.currentTimeMillis() - 10 * day))
    Files.writeString(Paths.get(dir.toString, "new.csv"), "y")
    // dir mtime itself may be old on some filesystems; the NEWEST
    // child (just written) keeps the sink fresh
    Files.setLastModifiedTime(dir,
      FileTime.fromMillis(System.currentTimeMillis() - 10 * day))
    val r = Freshness.fileAge(spark, dir.toString, maxAgeMillis = day)
    assert(!r.stale, s"directory read as stale: $r")
  }

  test("a missing input is a hard error, not a warning") {
    intercept[java.io.FileNotFoundException] {
      Freshness.fileAge(spark, "/tmp/does_not_exist_freshness.csv", 1000L)
    }
  }
}
