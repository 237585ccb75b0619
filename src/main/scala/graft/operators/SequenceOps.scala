package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField}

/** PG/GP sequences re-expressed for a distributed engine (reference:
  * commands/sequence.c:1-40 — `nextval` hands out values from a
  * single-point allocator; on GP every segment round-trips to the
  * master sequence server, `cdb/cdbvars.c` seqserver, a known scale
  * bottleneck the docs tell you to avoid for bulk loads).
  *
  * Spark-first translation, two regimes:
  *
  *  - **Catalog-scale** `nextval`/`currval`/`setval`: a driver-held
  *    counter (this mirrors the master allocator; fine for the
  *    DDL/bookkeeping calls it exists for).
  *  - **Bulk assignment** (INSERT ... SELECT nextval(...) over millions
  *    of rows): never a per-row driver round-trip and never a global
  *    `row_number() OVER (ORDER BY ...)` — that window has no PARTITION
  *    BY, so Spark moves the whole table through ONE partition.
  *    [[assignIds]] instead range-partitions on the order keys, sorts
  *    within partitions, and zips a per-partition offset (one count job
  *    + one assignment pass; driver state = one Long per partition).
  *    This is the same trick RDD.zipWithIndex uses and it scales with
  *    the cluster: at 100 TB the count pass is a cheap column-less scan
  *    and no executor ever holds more than its own partition.
  *
  * PG guarantees uniqueness, not density or order; we additionally
  * guarantee density and order-by-key, which makes results
  * oracle-checkable (`row_number() OVER (ORDER BY key)`).
  */
object SequenceOps {

  /** Add `idCol` = base, base+step, base+2*step, ... assigned in
    * `orderCols` order, distributed (no single-partition window).
    * Order keys must be a total order (unique) for deterministic
    * output — same caveat as row_number ties. */
  def assignIds(
      df: DataFrame, idCol: String, base: Long,
      orderCols: Seq[Column], step: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(df.rdd.getNumPartitions, 1)
    // zipWithIndex runs a count job then the assignment pass; cache the
    // sorted input so the second pass doesn't redo the shuffle+sort
    // (released by the pipeline owner via KernelCaches).
    val sorted = df
      .repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .cache()
    KernelCaches.register(sorted)
    val schema = sorted.schema.add(StructField(idCol, LongType, false))
    val out = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (base + i * step))
    }
    spark.createDataFrame(out, schema)
  }

  // ---- catalog-scale sequence objects (nextval/currval/setval) -------

  final case class SeqState(
      var value: Long, var called: Boolean, increment: Long, start: Long)

  private val sequences = new ConcurrentHashMap[String, SeqState]()

  def create(name: String, start: Long = 1L, increment: Long = 1L): Unit =
    sequences.put(name.toLowerCase, SeqState(start, called = false, increment, start))

  def drop(name: String): Unit = sequences.remove(name.toLowerCase)

  def exists(name: String): Boolean = sequences.containsKey(name.toLowerCase)

  private def state(name: String): SeqState = {
    val s = sequences.get(name.toLowerCase)
    if (s == null)
      throw new IllegalArgumentException(s"sequence $name does not exist")
    s
  }

  /** PG nextval: first call returns START, later calls advance. */
  def nextval(name: String): Long = {
    val s = state(name)
    s.synchronized {
      if (s.called) s.value += s.increment else s.called = true
      s.value
    }
  }

  /** PG currval: last value this session; error before first nextval. */
  def currval(name: String): Long = {
    val s = state(name)
    s.synchronized {
      if (!s.called) throw new IllegalStateException(
        s"currval of sequence $name is not yet defined in this session")
      s.value
    }
  }

  /** PG setval(name, v[, is_called]). */
  def setval(name: String, v: Long, isCalled: Boolean = true): Long = {
    val s = state(name)
    s.synchronized { s.value = v; s.called = isCalled; v }
  }

  /** Reserve `n` consecutive values for a bulk assignment; returns the
    * first. One driver call per *load*, not per row — the GP analogue
    * is the seqserver cache (`CACHE n`), taken to its logical limit. */
  def reserve(name: String, n: Long): Long = {
    val s = state(name)
    s.synchronized {
      val first = if (s.called) s.value + s.increment else s.start
      s.value = first + (n - 1) * s.increment
      s.called = true
      first
    }
  }

  /** Bulk `SELECT nextval('seq'), ...` over a DataFrame: reserve a
    * contiguous block and assign distributed, in `orderCols` order. */
  def assignFromSequence(
      df: DataFrame, seqName: String, idCol: String,
      orderCols: Seq[Column]): DataFrame = {
    val s = state(seqName)
    val cached = df.cache()
    KernelCaches.register(cached)
    val n = cached.count()
    if (n == 0) return assignIds(cached, idCol, 0L, orderCols, s.increment)
    val base = reserve(seqName, n)
    assignIds(cached, idCol, base, orderCols, s.increment)
  }
}
