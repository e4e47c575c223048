package graft

import org.apache.spark.sql.functions._
import graft.sources.WatsonTables

/**
 * Watson Tables against the reference's checked-in fixture
 * (test_data/io/test_watson_tables/archive.json, exercised by
 * io/watson/test_tables.py). Goldens read directly from the fixture JSON.
 */
class WatsonTablesSpec extends GraftSuite {

  private lazy val archive: Map[String, String] = {
    // archive.json maps name -> response dict; split into per-response JSON
    // strings without a JSON library by re-serializing through Spark
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/test_data/io/test_watson_tables/archive.json")))
    import spark.implicits._
    val df = spark.read.json(Seq(raw).toDS)
    df.columns.map { name =>
      name -> df.select(to_json(col(s"`$name`")).as("j")).head().getString(0)
    }.toMap
  }

  private def responseDf(name: String) = {
    import spark.implicits._
    Seq((0L, archive(name))).toDF("doc_id", "response")
  }

  test("parse_response relations: headers + body cells (20-populous-countries)") {
    val r = responseDf("20-populous-countries")
    assert(WatsonTables.tables(r).count() == 1)
    assert(WatsonTables.colHeaders(r).count() == 6)
    assert(WatsonTables.rowHeaders(r).count() == 0)
    val cells = WatsonTables.bodyCells(r)
    assert(cells.count() == 126)
    val c0 = cells.orderBy("begin").head()
    assert(c0.getAs[String]("text") == "1" &&
      c0.getAs[String]("column_header_texts") == "Rank")
  }

  test("make_table pivot reconstruction (tables.py:584-607)") {
    val cells = WatsonTables.bodyCells(responseDf("20-populous-countries"))
    val table = WatsonTables.makeTable(cells)
    assert(table.count() == 21)
    val cols = table.columns.toSet
    assert(cols.contains("Rank") && cols.contains("Population") && cols.contains("Date"))
    val row1 = table.filter(col("row_idx") === 1).head()
    assert(row1.getAs[String]("Rank") == "1")
    assert(row1.getAs[String]("Population") == "1,403,627,360")
    val row3 = table.filter(col("row_idx") === 3).head()
    assert(row3.getAs[String]("% of worldpopulation") == "4.23%")
  }

  test("make_exploded_df long form pivots into make_table exactly (tables.py:348-447)") {
    val cells = WatsonTables.bodyCells(responseDf("20-populous-countries"))
    val exploded = WatsonTables.makeExplodedDf(cells)
    assert(exploded.columns.toSeq ==
      Seq("doc_id", "table_idx", "row_idx", "row_key", "column_key", "value"))
    // one row per populated (row, column) pair, none lost or invented
    assert(exploded.count() == 126)
    // pivoting the exploded relation by hand reproduces makeTable's cells
    val table = WatsonTables.makeTable(cells)
    for (colName <- Seq("Rank", "Population", "Date")) {
      val fromTable = table.select(col("row_idx"), col(colName))
        .filter(col(colName).isNotNull)
        .collect().map(r => r.get(0).toString -> r.getString(1)).toMap
      val fromExploded = exploded.filter(col("column_key") === colName)
        .select("row_idx", "value")
        .collect().map(r => r.get(0).toString -> r.getString(1)).toMap
      assert(fromTable == fromExploded, s"column $colName diverged")
    }
  }

  test("double-header table: multi-header texts join with ' | '") {
    val cells = WatsonTables.bodyCells(responseDf("double_header_table"))
    assert(cells.count() == 16)
    val c0 = cells.orderBy("begin").limit(1).head()
    assert(c0.getAs[String]("row_header_texts") == "Statatory tax rate")
    assert(c0.getAs[String]("column_header_texts") ==
      "Three months ended setptember 30 | 2005")
    val table = WatsonTables.makeTable(cells)
    assert(table.count() == 4) // 4 row headers
    assert(table.columns.contains("Three months ended setptember 30 | 2005"))
  }

  test("inferred pivot columns follow sort_headers order (tables.py:617-633)") {
    val cells = WatsonTables.bodyCells(responseDf("20-populous-countries"))
    val table = WatsonTables.makeTable(cells)
    val expected = cells
      .groupBy(col("column_header_texts").as("k"))
      .agg(min("column_index_begin").as("ci"))
      .orderBy(col("ci"), col("k"))
      .collect().map(_.getString(0)).toSeq
    val pivotCols = table.columns.filterNot(
      Set("doc_id", "table_idx", "row_idx", "row_key")).toSeq
    assert(pivotCols == expected,
      s"pivot columns not in column_index order: $pivotCols vs $expected")
    // index order differs from the lexicographic order the old code used,
    // so this asserts the reference ordering, not an accident
    assert(pivotCols != pivotCols.sorted)
  }

  test("numeric conversion on explicit columns (tables.py:209-302)") {
    val cells = WatsonTables.bodyCells(responseDf("20-populous-countries"))
    val table = WatsonTables.convertNumericCols(WatsonTables.makeTable(cells),
      Seq("Population", "Rank"))
    val row1 = table.filter(col("row_idx") === 1).head()
    assert(row1.getAs[Double]("Population") == 1403627360.0)
    assert(row1.getAs[Double]("Rank") == 1.0)
    val inferred = WatsonTables.inferNumericCols(cells)
    assert(inferred.contains("Rank") && inferred.contains("Population"))
    assert(!inferred.contains("Source"))
  }

  test("substitute_text_names swaps header ids for display text (tables.py:328-345)") {
    import spark.implicits._
    // table pivoted on id keys: rows r0/r1, columns c0/c1
    val table = Seq(
      (0L, 0, 0, "r0", "v00", "v01"),
      (0L, 0, 1, "r1", "v10", "v11"),
      (1L, 0, 0, "r0", "w00", "w01"))
      .toDF("doc_id", "table_idx", "row_idx", "row_key", "c0", "c1")
    // row header text differs per document — the join must key on doc
    val rowH = Seq((0L, 0, "r0", "Alpha"), (0L, 0, "r1", "Beta"),
      (1L, 0, "r0", "Gamma"))
      .toDF("doc_id", "table_idx", "cell_id", "text")
    val colH = Seq((0L, 0, "c0", "Left"), (0L, 0, "c1", "Right"),
      (1L, 0, "c0", "Left"), (1L, 0, "c1", "Right"))
      .toDF("doc_id", "table_idx", "cell_id", "text")
    val out = WatsonTables.substituteTextNames(table, rowH, colH)
    assert(out.columns.toSeq == Seq("doc_id", "table_idx", "row_idx",
      "row_key", "Left", "Right"))
    val keys = out.orderBy("doc_id", "row_idx")
      .select("row_key").collect().map(_.getString(0)).toSeq
    assert(keys == Seq("Alpha", "Beta", "Gamma"))
    // unmatched keys survive; sub_rows/sub_cols toggles gate each half
    val partial = WatsonTables.substituteTextNames(table,
      rowH.filter(col("cell_id") =!= "r1"), colH, subCols = false)
    assert(partial.columns.contains("c0"))
    assert(partial.filter(col("doc_id") === 0 && col("row_idx") === 1)
      .head().getAs[String]("row_key") == "r1")
  }
}
