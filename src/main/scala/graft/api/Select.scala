package graft.api

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
  ShortType, StructField, StructType}

/** Multi-objective (Pareto) corpus selection.
  *
  * The skyline operator — Börzsönyi, Kossmann & Stocker, "The Skyline
  * Operator" (ICDE 2001) — keeps every row no other row beats on ALL
  * objectives at once: dominance, not ranking, so incomparable
  * trade-offs (more information vs fewer bytes vs less repetition)
  * need no invented weights. Row q dominates row p iff q is ≥ p on
  * every oriented objective and strictly better on at least one;
  * duplicate objective vectors never dominate each other, so ties all
  * stay on the frontier.
  */
object Select {

  /** Skyline (Pareto frontier) of `df` over integer `objectives`
    * (column name, maximize?) — minimize dimensions are negated
    * internally so one dominance form serves both orientations.
    * Returns the undominated rows with the input schema.
    *
    * Scale shape (the distributed-skyline two-phase): each row maps to
    * a grid cell of `bins`ᵈ equal-width bins over the oriented
    * objectives (bounds from one min/max aggregate, broadcast). A cell
    * is pruned when some nonempty cell is STRICTLY higher in all bin
    * indices — any point there beats every point here on all
    * objectives, because bins are disjoint intervals so a higher bin
    * holds strictly higher values. Dominance is transitive, so every
    * dominated point has a dominator ON the skyline, and the skyline
    * lives entirely in surviving cells — checking survivors against
    * survivors is exact, not approximate. The cell census (≤ binsᵈ
    * rows) is the only driver-side structure (the broadcast-codebook
    * discipline); the final exact pass is one broadcast dominance
    * anti-join over the surviving fraction, capped in path at
    * `maxSurvivors` (the d13 discipline — a bounded broadcast, not an
    * OOM discovery). The input is scanned exactly twice and never
    * globally sorted.
    */
  def paretoSkyline(df: DataFrame, objectives: Seq[(String, Boolean)],
      bins: Long = 8L, maxSurvivors: Long = 2000000L): DataFrame = {
    require(objectives.nonEmpty, "paretoSkyline needs >= 1 objective")
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    objectives.foreach { case (c, _) =>
      val dt = df.schema(c).dataType
      require(integral(dt),
        s"paretoSkyline objective $c must be integral, got $dt " +
          "(quantize doubles first so dominance is exact)")
    }
    val spark = df.sparkSession
    val keep = df.columns.toSeq
    val n = objectives.size
    val oCols = objectives.zipWithIndex.map { case ((c, maxim), i) =>
      (if (maxim) col(c).cast("long") else -col(c).cast("long"))
        .as(s"__o$i")
    }
    val oriented = df.select(keep.map(col) ++ oCols: _*)
    val boundAggs = (0 until n).flatMap(i =>
      Seq(min(s"__o$i").as(s"__mn$i"), max(s"__o$i").as(s"__mx$i")))
    val bounds = oriented.agg(boundAggs.head, boundAggs.tail: _*)
    val bCols = (0 until n).map(i => s"__b$i")
    val binned = (0 until n).foldLeft(
      oriented.crossJoin(broadcast(bounds))) { (acc, i) =>
      acc.withColumn(s"__b$i", expr(
        s"CAST(((__o$i - __mn$i) * $bins) div (__mx$i - __mn$i + 1) AS INT)"))
    }
    // bounded collect: ≤ binsᵈ nonempty cells by construction
    val cells = binned.groupBy(bCols.map(col): _*)
      .agg(count(lit(1)).cast("bigint").as("__n"))
      .collect()
      .map(r => ((0 until n).map(r.getInt), r.getLong(n)))
    val surviving = cells.filter { case (b, _) =>
      !cells.exists { case (c, _) =>
        (0 until n).forall(i => c(i) > b(i)) }
    }
    val nSurvivors = surviving.map(_._2).sum
    require(nSurvivors <= maxSurvivors,
      s"paretoSkyline exact-verify leg would broadcast $nSurvivors " +
        s"survivors (cap $maxSurvivors): raise bins before the cap")
    val cellSchema = StructType(bCols.map(c =>
      StructField(c, IntegerType, nullable = false)))
    val survCells = spark.createDataFrame(
      java.util.Arrays.asList(
        surviving.map { case (b, _) => Row(b: _*) }: _*), cellSchema)
    val survivors = binned
      .join(broadcast(survCells), bCols)
      .select((keep ++ (0 until n).map(i => s"__o$i")).map(col): _*)
    val geAll = (0 until n)
      .map(i => col(s"q.__o$i") >= col(s"p.__o$i")).reduce(_ && _)
    val gtAny = (0 until n)
      .map(i => col(s"q.__o$i") > col(s"p.__o$i")).reduce(_ || _)
    survivors.as("p")
      .join(broadcast(survivors.as("q")), geAll && gtAny, "left_anti")
      .select(keep.map(col): _*)
  }
}
