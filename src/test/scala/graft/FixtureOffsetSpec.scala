package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Guard against the fixture defect class three consecutive scale drills
  * paid to find: a FIXED integer offset/multiplier applied to a key column
  * ("disjoint" key shift `+1e6`, argmin packing `*1e8`) that the data
  * outgrows at a higher SF — shifted keys re-enter the real keyspace and
  * collide (round-10 sf10 catch: hub_incremental_multi, merge_partitioned,
  * txlog_merge; round-9: geo argmin packing).
  *
  * The rule the codebase now follows (see memory + VERDICT r10): key
  * offsets/packing multipliers must be derived from the data
  * (`max(key)+1`) on BOTH engines, or be provably out-of-domain at every
  * SF (pure negation for poison fixtures). This spec lints the query
  * sources — Scala AND the embedded oracle SQL — for the banned shape:
  *
  *   <key-ish column> + <wide positive int literal>      (keyspace shift)
  *   <key-ish column> * <wide positive int literal>      (packing), unless
  *     immediately mod-bounded (`% m` folds the product into a coordinate
  *     domain, which cannot collide with a keyspace)
  *
  * "Wide" = ≥ 5 digits: small literals (`% 3`, `+ 7`, calendar spans) are
  * fixture arithmetic, not keyspace engineering. Negative shifts by pure
  * negation don't match `+` and are allowed by design.
  */
class FixtureOffsetSpec extends AnyFunSuite {

  test("lint catches a planted fixed key offset and a planted unbounded packing multiplier") {
    assert(FixtureOffsetLint.scanLine("""ord.select((col("o_custkey") + 10000000).as("k"))""").nonEmpty)
    assert(FixtureOffsetLint.scanLine("""SELECT o_custkey + 100000 AS poison FROM orders""").nonEmpty)
    assert(FixtureOffsetLint.scanLine("""val packed = col("s_suppkey") * 100000000L + col("d2")""").nonEmpty)
    assert(FixtureOffsetLint.scanLine("""expr("c_custkey * 100000 + rank")""").nonEmpty)
  }

  test("lint allows the sanctioned shapes: negation, mod-bounded synthesis, small literals, derived offsets") {
    assert(FixtureOffsetLint.scanLine("""ordBatch("2024-02-04", k => -k - 1)""").isEmpty)
    assert(FixtureOffsetLint.scanLine("""(col(key) * 48271L) % 10000L""").isEmpty,
      "LCG coordinate synthesis is mod-bounded — product never re-enters the keyspace")
    assert(FixtureOffsetLint.scanLine("""(c_custkey * 16807) % 20000 AS lon_md""").isEmpty)
    assert(FixtureOffsetLint.scanLine("""col("o_custkey") + 7""").isEmpty)
    assert(FixtureOffsetLint.scanLine("""col("c_custkey") + maxKey + 1""").isEmpty,
      "derived-from-data offsets are the required pattern")
  }

  test("no fixed key offsets / unbounded packing multipliers in src/main") {
    val root = Paths.get("src/main/scala/graft")
    assert(Files.isDirectory(root), s"expected to run from the repo root; cwd=${Paths.get("").toAbsolutePath}")
    val hits: Seq[String] = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        Files.readAllLines(p).asScala.zipWithIndex.flatMap { case (line, i) =>
          FixtureOffsetLint.scanLine(line).map(m => s"$p:${i + 1}: $m  [$line]")
        }
      }.toSeq
    assert(hits.isEmpty,
      "fixed key offset/packing literal found — derive it from max(key)+1 on both engines, " +
        "or use pure negation for poison fixtures:\n" + hits.mkString("\n"))
  }
}

object FixtureOffsetLint {
  // key-ish operand: bare SQL identifier (o_custkey, user_id), a Scala
  // col("..")/$".." reference, or a variable named like a key — right
  // before the operator. `_id`-suffixed and `key`-suffixed names cover
  // every key column in the testdata schema.
  private val keyRef = """(?:[A-Za-z_][\w.]*(?:key|_id)|[\w("$'`.]*(?:key|_id)["'`]?\)?)"""
  private val intLit = """(\d{5,})L?\b"""
  private val plus = ("(?i)" + keyRef + """\s*\+\s*(?:lit\(\s*)?""" + intLit).r
  private val times = ("(?i)" + keyRef + """\s*\*\s*(?:lit\(\s*)?""" + intLit).r
  // a multiply is sanctioned when the product is folded straight into a
  // bounded domain: `% m` within a few tokens after the literal
  private val modBounded = """^L?\)?\s*%\s*\d""".r

  /** Some(description) when `line` contains a banned fixed-offset shape. */
  def scanLine(line: String): Option[String] = {
    val l = stripLineComment(line)
    plus.findFirstMatchIn(l)
      .map(m => s"fixed key offset +${m.group(1)}")
      .orElse {
        times.findFirstMatchIn(l).collect {
          case m if modBounded.findFirstIn(l.substring(m.end)).isEmpty =>
            s"unbounded key packing *${m.group(1)}"
        }
      }
  }

  private def stripLineComment(line: String): String = {
    val i = line.indexOf("//")
    if (i >= 0) line.substring(0, i) else line
  }
}
