package graft

import org.apache.spark.sql.functions._

/** Controls for the layout-invariance gate ([[LayoutInvarianceCheck]]):
  * a diff-based gate is only evidence if its alternate layout actually
  * DISTINGUISHES layout-dependent computations from invariant ones —
  * otherwise 135 green diffs could mean "the fixture changed nothing".
  *
  *   - negative control: probes that READ the physical layout (file
  *     membership, partition-discovery schema) must come out DIFFERENT
  *     across the two layouts — the perturbation is real;
  *   - positive control: a totally-ordered pack query must come out
  *     row-identical — the gate's pass criterion is achievable and the
  *     fixture holds the logical table constant.
  */
class LayoutInvarianceSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val alt: String = {
    assume(new java.io.File(s"$sf/documents.parquet").exists(),
      s"driver testdata absent at $sf")
    val d = java.nio.file.Files.createTempDirectory("graft_layout_spec")
      .toString
    LayoutInvarianceCheck.buildLayout(spark, sf, d)
    d
  }

  test("negative control: the alternate layout is a real perturbation") {
    // documents: one flat file vs 8 hash-bucket files
    def docFiles(dir: String): Long =
      Tables.documents(spark, dir)
        .select(input_file_name().as("f")).distinct().count()
    val flatFiles = docFiles(sf)
    val altFiles = docFiles(alt)
    assert(flatFiles == 1L, s"flat layout reads $flatFiles files")
    assert(altFiles > 1L, "bucketed layout must scatter rows across files")

    // documents: bucket files group rows by doc_id hash, so the
    // per-file row-count multiset differs from the flat single file —
    // a probe that leaks file membership into its result changes value
    // across layouts
    def perFileCounts(dir: String): Seq[Long] =
      Tables.documents(spark, dir)
        .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
        .select($"n").as[Long].collect().toSeq.sorted
    assert(perFileCounts(sf) != perFileCounts(alt),
      "per-file row counts should differ between flat and bucketed")

    // events: partition discovery ADDS event_date to the schema — the
    // select-*-over-events leak the gate exists to catch
    val flatCols = Tables.events(spark, sf).columns.toSet
    val altCols = Tables.events(spark, alt).columns.toSet
    assert(!flatCols.contains("event_date"), flatCols.toString)
    assert(altCols.contains("event_date"),
      s"partitioned events must surface the partition column: $altCols")
    // >2 day directories: the same self-check the gate main requires
    val dateDirs = Option(new java.io.File(s"$alt/events.parquet")
      .listFiles()).toSeq.flatten
      .count(d => d.isDirectory && d.getName.startsWith("event_date="))
    assert(dateDirs > 2, s"only $dateDirs date partitions")
  }

  test("positive control: a totally-ordered query is row-identical") {
    def rows(dir: String): Seq[String] =
      SparkEntry.queries("q23_exact_dedup")(spark, dir)
        .collect().map(_.toString).toSeq
    val flat = rows(sf)
    val a = rows(alt)
    Caching.release(); spark.catalog.clearCache()
    assert(flat.nonEmpty && flat == a,
      "exact dedup must not depend on the input layout")
  }
}
