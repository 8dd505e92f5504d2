package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.expr._
import graft.core.transform._
import graft.core.types._

/** Soundness invariants of the partition-pruning engine, checked over
  * boundary-rich value pools and seeded predicate combinations — the
  * properties the reference pins with TestInclusiveMetricsEvaluator /
  * TestStrictMetricsEvaluator / TestProjection, generalized:
  *
  *  1. INCLUSIVE projection never prunes a matching row's partition
  *     (rowMatch ⇒ partition survives) — a violation is silent data loss.
  *  2. STRICT projection only accepts partitions where EVERY row matches
  *     (partition accepted ⇒ rowMatch) — a violation makes
  *     metadata-only DELETE drop rows it shouldn't.
  *  3. RESIDUAL is exact: evaluating the residual on a row of that
  *     partition equals evaluating the original predicate.
  *
  * Pools deliberately include transform boundaries (day/hour/month/year
  * edges, pre-1970 micros for floor semantics, truncate-width edges,
  * empty strings) and nulls.
  */
class PruningPropertySpec extends AnyFunSuite {

  private val schema = GSchema(GStruct(Seq(
    GField(1, "x", GLong),
    GField(2, "s", GString),
    GField(3, "ts", GTimestamp()))))

  private val DayUs = 86400000000L
  private val HourUs = 3600000000L
  private val day0 = java.time.LocalDate.of(1996, 3, 15).toEpochDay * DayUs

  private val longPool: Seq[Any] =
    Seq(-101L, -100L, -11L, -10L, -1L, 0L, 1L, 9L, 10L, 11L, 99L, 100L, 12345L)
  private val stringPool: Seq[Any] =
    Seq("", "a", "ab", "abc", "abd", "abca", "abcdef", "xyz")
  private val tsPool: Seq[Any] = Seq(
    day0 - 1, day0, day0 + 1, day0 + HourUs - 1, day0 + HourUs,
    -1L, 0L, 1L, -DayUs, -DayUs - 1, -DayUs + 1,
    day0 + 365L * DayUs, -12345L * DayUs, 4102444800000000L)

  private def pool(col: String): Seq[Any] = col match {
    case "x" => longPool
    case "s" => stringPool
    case _   => tsPool
  }

  // every comparison leaf over every column and every pool literal,
  // plus membership / null / prefix forms
  private val leaves: Seq[Expr] = {
    val cols = Seq("x", "s", "ts")
    val cmp = for {
      c <- cols; v <- pool(c)
      e <- Seq(Expr.lt(c, v), Expr.ltEq(c, v), Expr.gt(c, v),
        Expr.gtEq(c, v), Expr.equalTo(c, v), Expr.notEq(c, v))
    } yield e
    val ins = for (c <- cols) yield {
      val vs = pool(c).take(3)
      Seq(Expr.in(c, vs), Expr.notIn(c, vs))
    }
    val nulls = cols.flatMap(c => Seq(Expr.isNull(c), Expr.notNull(c)))
    val prefix = stringPool.collect { case p: String =>
      Seq(Expr.startsWith("s", p), Expr.not(Expr.startsWith("s", p)))
    }.flatten
    cmp ++ ins.flatten ++ nulls ++ prefix
  }

  // seeded random And/Or/Not combinations over the leaves
  private val combos: Seq[Expr] = {
    val rnd = new scala.util.Random(42)
    def pick(): Expr = leaves(rnd.nextInt(leaves.size))
    (0 until 160).map { _ =>
      rnd.nextInt(4) match {
        case 0 => Expr.and(pick(), pick())
        case 1 => Expr.or(pick(), pick())
        case 2 => Expr.not(Expr.and(pick(), pick()))
        case 3 => Expr.or(Expr.and(pick(), pick()), Expr.not(pick()))
      }
    }
  }

  // seeded row sample over the (x ∪ null) × (s ∪ null) × (ts ∪ null) space
  private val rows: Seq[ArrayRow] = {
    val rnd = new scala.util.Random(7)
    def draw(p: Seq[Any]): Any =
      if (rnd.nextInt(10) == 0) null else p(rnd.nextInt(p.size))
    (0 until 140).map(_ =>
      ArrayRow(Array[Any](draw(longPool), draw(stringPool), draw(tsPool))))
  }

  private val specs: Seq[(String, PartitionSpec)] = Seq(
    "identity(x)" -> PartitionSpec.of(schema, "x" -> IdentityT),
    "bucket8(x)" -> PartitionSpec.of(schema, "x" -> BucketT(8)),
    "truncate10(x)" -> PartitionSpec.of(schema, "x" -> TruncateT(10)),
    "identity(s)" -> PartitionSpec.of(schema, "s" -> IdentityT),
    "bucket8(s)" -> PartitionSpec.of(schema, "s" -> BucketT(8)),
    "truncate3(s)" -> PartitionSpec.of(schema, "s" -> TruncateT(3)),
    "bucket8(ts)" -> PartitionSpec.of(schema, "ts" -> BucketT(8)),
    "year(ts)" -> PartitionSpec.of(schema, "ts" -> YearT),
    "month(ts)" -> PartitionSpec.of(schema, "ts" -> MonthT),
    "day(ts)" -> PartitionSpec.of(schema, "ts" -> DayT),
    "hour(ts)" -> PartitionSpec.of(schema, "ts" -> HourT),
    "day(ts),bucket8(x)" ->
      PartitionSpec.of(schema, "ts" -> DayT, "x" -> BucketT(8)))

  for ((specName, spec) <- specs)
    test(s"projection soundness over $specName") {
      var checked = 0
      for (pred <- leaves ++ combos) {
        val bound = Expr.bind(schema, pred)
        val inc = Projections.inclusive(spec, schema, bound)
        val str = Projections.strict(spec, schema, bound)
        for (row <- rows) {
          val part = ArrayRow(spec.partitionValues(schema, row))
          val rowMatch = RowEvaluator.eval(bound, row)
          if (rowMatch)
            assert(RowEvaluator.eval(inc, part),
              s"INCLUSIVE pruned a matching row: spec=$specName pred=$pred " +
                s"row=${row.values.toSeq} part=${part.values.toSeq}")
          if (RowEvaluator.eval(str, part))
            assert(rowMatch,
              s"STRICT accepted a non-matching row: spec=$specName pred=$pred " +
                s"row=${row.values.toSeq} part=${part.values.toSeq}")
          val res = Projections.residual(spec, schema, bound, part)
          assert(RowEvaluator.eval(res, row) == rowMatch,
            s"RESIDUAL diverges: spec=$specName pred=$pred " +
              s"row=${row.values.toSeq} part=${part.values.toSeq} residual=$res")
          checked += 1
        }
      }
      assert(checked > 50000)
    }

  // ---- metrics-evaluator soundness (file-stats pruning layer) --------

  private def statsOf(group: Seq[ArrayRow]): FileStats = {
    val types = Map(1 -> GLong, 2 -> GString, 3 -> GTimestamp())
    val cols = (0 until 3).map { pos =>
      val id = pos + 1
      val vs = group.map(_.values(pos))
      val nonNull = vs.filter(_ != null)
      val ord = new Ordering[Any] {
        def compare(a: Any, b: Any): Int = TypeComparators.compare(types(id), a, b)
      }
      id -> ColStats(
        valueCount = Some(vs.size.toLong),
        nullCount = Some((vs.size - nonNull.size).toLong),
        lower = if (nonNull.isEmpty) None else Some(nonNull.min(ord)),
        upper = if (nonNull.isEmpty) None else Some(nonNull.max(ord)))
    }.toMap
    FileStats(group.size.toLong, cols)
  }

  test("metrics evaluators are sound over row-derived file stats") {
    val rnd = new scala.util.Random(11)
    // files of 8 rows: random groups (wide bounds) + groups sorted by x
    // (tight bounds), + one file with NO stats (conservatism check)
    val shuffled = rnd.shuffle(rows).grouped(8).toSeq
    val sorted = rows.sortBy(r => Option(r.values(0).asInstanceOf[java.lang.Long])
      .map(_.longValue).getOrElse(Long.MinValue)).grouped(8).toSeq
    val files: Seq[(Seq[ArrayRow], FileStats)] =
      (shuffled ++ sorted).map(g => g -> statsOf(g)) :+
        (rows.take(8) -> FileStats(8L, Map.empty))
    var checked = 0
    for (pred <- leaves ++ combos) {
      val bound = Expr.bind(schema, pred)
      for ((group, stats) <- files) {
        val anyMatch = group.exists(RowEvaluator.eval(bound, _))
        val allMatch = group.forall(RowEvaluator.eval(bound, _))
        if (anyMatch)
          assert(InclusiveMetricsEvaluator.rowsMightMatch(bound, stats),
            s"INCLUSIVE metrics pruned a file with a matching row: pred=$pred " +
              s"stats=$stats rows=${group.map(_.values.toSeq)}")
        if (StrictMetricsEvaluator.rowsMustMatch(bound, stats))
          assert(allMatch,
            s"STRICT metrics claimed all-match falsely: pred=$pred " +
              s"stats=$stats rows=${group.map(_.values.toSeq)}")
        checked += 1
      }
    }
    assert(checked > 10000)
  }
}
