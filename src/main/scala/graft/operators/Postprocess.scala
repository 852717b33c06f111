package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** On/off-series postprocessing operators from the reference's
  * disaggregation pipeline (`bert_single_appliance/postprocessing.py`):
  * binary thresholding, run-length analysis, minimum-duration run
  * zeroing, and sliding-median smoothing — all as single-shuffle window
  * compositions instead of the reference's driver-side numpy scans.
  */
object Postprocess {

  // internal working columns — prefixed so they can't collide with (or
  // silently overwrite) caller columns of the same name
  private val StateCol = "__graft_state"
  private val RunIdCol = "__graft_run_id"
  private val RunLenCol = "__graft_run_len"

  /** Binary threshold (postprocessing.py:32-42): 1 where value >= t. */
  def threshold(value: Column, t: Double): Column =
    when(value >= t, 1).otherwise(0).cast("int")

  /** Run-length encoding: consecutive equal `state` values per key form a
    * run. Returns run-level rows: key, state, run_id, run_len.
    * (postprocessing.py:5-24 computes this with an imperative scan.) */
  def runs(df: DataFrame, key: Column, orderCols: Seq[Column],
           state: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val withState = df.withColumn(StateCol, state)
    // edge = state changed vs previous row (null-safe: first row is an edge)
    val edge = when(!(lag(col(StateCol), 1).over(w) <=> col(StateCol)), 1L)
      .otherwise(0L)
    withState
      .withColumn(RunIdCol,
        sum(edge).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(key, col(StateCol), col(RunIdCol))
      .agg(count(lit(1)).as("run_len"))
      .withColumnRenamed(StateCol, "state")
      .withColumnRenamed(RunIdCol, "run_id")
  }

  /** Zero-out ON runs shorter than `minLen` rows — the reference's
    * minimum-ON-duration filter (postprocessing.py:5-24, 80 s at 8 s rate
    * = 10 samples). Note the reference zeroes a trailing ON run only when
    * it is short (postprocessing.py:22-23) — same here, since the trailing
    * run is just another run. Row-level: returns the input columns plus
    * `state` (the thresholded input) and `state_filtered`. */
  def minDurationFilter(df: DataFrame, key: Column, orderCols: Seq[Column],
                        state: Column, minLen: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val withState = df.withColumn(StateCol, state)
    val edge = when(!(lag(col(StateCol), 1).over(w) <=> col(StateCol)), 1L)
      .otherwise(0L)
    val withRun = withState.withColumn(RunIdCol,
      sum(edge).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wRun = Window.partitionBy(key, col(RunIdCol))
    withRun
      .withColumn(RunLenCol, count(lit(1)).over(wRun))
      .withColumn("state_filtered",
        when(col(StateCol) === 1 && col(RunLenCol) < minLen, 0)
          .otherwise(col(StateCol)))
      .withColumn("state", col(StateCol))
      .drop(StateCol, RunIdCol, RunLenCol)
  }

  /** Exact sliding median over rows [-k, +k] per key — the distributed
    * counterpart of the reference's smoothing step (postprocessing.py:27-30,
    * which uses `scipy.ndimage.median_filter`). Semantics here follow SQL
    * `quantile_cont(x, 0.5)` — shrinking frames at partition edges and
    * linear interpolation for even counts — NOT scipy exactly (scipy
    * reflect-pads the boundary and picks a low element for even windows);
    * quantile_cont is what the DuckDB oracle compares. Null values are
    * skipped by collect_list; an all-null frame yields null (guarded).
    * Adds column `median_value`.
    *
    * For LARGE windows prefer [[slidingMedianPartitioned]]: the
    * collect_list fallback here re-buffers and re-sorts the full 2k+1
    * frame per row — measured 43× slower than the dual-heap sorted pass
    * at window 101 on 30 M rows (SCALE.md round 16). This form remains
    * the pick for the reference's own k ≤ 8 smoothing (lag/lead stays
    * in whole-stage codegen, no re-encoding of the row). */
  def slidingMedian(df: DataFrame, key: Column, orderCols: Seq[Column],
                    value: Column, k: Int): DataFrame = {
    // Small k (the reference's windows are 5-11 samples): build the
    // frame from codegen'd lag/lead columns instead of a per-row
    // collect_list window buffer (~2× faster at k=2 on 100k rows); the
    // partition-edge nulls are dropped, replicating the shrinking
    // frame. Large k falls back to the collect_list form.
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val arr =
      if (k <= 8) {
        val neighbors = (-k to k).map {
          case 0 => value
          case i if i < 0 => lag(value, -i).over(w)
          case i => lead(value, i).over(w)
        }
        array_sort(filter(array(neighbors: _*), v => v.isNotNull))
      } else
        array_sort(collect_list(value).over(w.rowsBetween(-k, k)))
    val n = size(arr)
    // odd n → middle element; even n > 0 → mean of the two middle elements
    val mid = ((n + lit(1)) / lit(2)).cast("int")
    val lo = (n / lit(2)).cast("int")
    val med = when(n % 2 === 1, element_at(arr, mid))
      .when(n > 0, (element_at(arr, lo) + element_at(arr, lo + lit(1))) / 2.0)
      .otherwise(lit(null))
    df.withColumn("median_value", med)
  }

  /** Trailing exponentially-weighted moving average over the last
    * `span` samples per key — the smoothing sibling of
    * [[slidingMedian]] (median kills impulse noise; EWMA tracks level
    * shifts with recency weighting). Weights follow the pandas
    * `ewm(alpha).mean()` `adjust=True` convention restricted to a
    * bounded trailing frame: for the frame x_1..x_n (oldest first),
    * `ewma = Σ x_i·(1−α)^(n−i) / Σ (1−α)^(n−i)` — a weighted mean, so
    * the first rows of a key are well-defined (no warm-up NaNs) and
    * the bounded frame keeps the state O(span), unlike the recursive
    * `adjust=False` form whose tail never truncates (a sequential
    * recursion Spark cannot parallelize without a prefix scan).
    *
    * Scale shape: one keyed window (hash exchange + in-partition sort
    * — same wide cost as every per-key ordered op here). span ≤ 16
    * evaluates as codegen'd lag columns (no per-row buffer; measured
    * 5.2× faster than the array form at span 10 on 10-30 M rows —
    * EwmaScaleBench, SCALE.md round 17); larger spans buffer the frame
    * with collect_list and fold. Each branch sums its terms in a fixed
    * sequential order, so the result is bit-stable across
    * partitionings (the two branches differ from EACH OTHER in
    * association order — value-equal to ~1e-15 relative, parity
    * spec-pinned).
    * Precondition: non-null `value` (a null would misalign the
    * weights). Adds `ewma`. */
  def ewma(df: DataFrame, key: Column, orderCols: Seq[Column],
           value: Column, alpha: Double, span: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(span >= 1, s"span must be >= 1, got $span")
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    if (span <= 16) {
      // Small span: codegen'd lag columns instead of a per-row
      // collect_list buffer — measured 5.2× faster at span 10 on 10-30 M
      // rows (EwmaScaleBench, SCALE.md round 17), the exact analogue of
      // slidingMedian's k ≤ 8 branch. Missing lags (first rows of a
      // key) contribute exactly 0.0 to both sums, appended at the TAIL
      // of the left-to-right reduction, so the value is bit-identical
      // to folding only the available newest-first terms.
      val num = (0 until span).map { j =>
        coalesce(lag(value, j).over(w) * math.pow(1 - alpha, j), lit(0.0))
      }.reduce(_ + _)
      val den = (0 until span).map { j =>
        when(lag(value, j).over(w).isNotNull,
          lit(math.pow(1 - alpha, j))).otherwise(lit(0.0))
      }.reduce(_ + _)
      df.withColumn("ewma", num / den)
    } else {
      val wf = w.rowsBetween(-(span - 1), 0)
      val vals = collect_list(value).over(wf)
      val n = size(vals)
      def fold(weighted: Column) =
        aggregate(weighted, lit(0.0), (acc, x) => acc + x)
      val num = fold(zip_with(vals, sequence(lit(1), n),
        (x, i) => x * pow(lit(1 - alpha), (n - i).cast("double"))))
      val den = fold(transform(sequence(lit(1), n),
        i => pow(lit(1 - alpha), (n - i).cast("double"))))
      df.withColumn("ewma", num / den)
    }
  }

  /** Sliding median with EXACT `scipy.ndimage.median_filter` semantics
    * (the reference's smoothing, postprocessing.py:27-30) — for users
    * replicating the reference's published numbers bit-for-bit, where
    * [[slidingMedian]]'s quantile_cont semantics (shrinking edge frames,
    * interpolation) differ at partition boundaries and even sizes.
    *
    * scipy's median_filter is a rank filter: window of `size` samples
    * spanning offsets [-size/2, (size-1)/2], boundary mode 'reflect'
    * (edge-duplicating pad: d c b a | a b c d | d c b a), and the
    * selected value is the sorted window's element at 0-based index
    * size/2 — NO interpolation for even sizes.
    *
    * Distributed form: the in-bounds frame comes from codegen'd
    * lag/lead columns; the reflected pad values are recovered from that
    * same frame (for a row within size/2 of the partition edge, the
    * reflected samples are exactly the first/last in-bounds frame
    * elements — a median only needs the multiset, not pad order), so no
    * second pass and no per-partition collect is needed. Precondition:
    * each partition has at least `size` rows (same as a meaningful
    * scipy call) and `value` is non-null. Adds `median_value`. */
  def slidingMedianScipy(df: DataFrame, key: Column, orderCols: Seq[Column],
                         value: Column, size: Int): DataFrame = {
    require(size >= 1, s"size must be >= 1, got $size")
    val kl = size / 2 // extent left of center (also the rank index)
    val kr = (size - 1) / 2 // extent right of center
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val neighbors = (-kl to kr).map {
      case 0 => value
      case i if i < 0 => lag(value, -i).over(w)
      case i => lead(value, i).over(w)
    }
    // ordered in-bounds window [x_max(1,i-kl) .. x_min(N,i+kr)]
    val arrIn = filter(array(neighbors: _*), v => v.isNotNull)
    val rn = row_number().over(w)
    val cnt = count(lit(1)).over(Window.partitionBy(key))
    // how many pad values are missing on each side
    val ml = greatest(lit(0), lit(kl) - (rn - 1))
    val mr = greatest(lit(0), lit(kr) - (cnt - rn))
    // reflect pad x[1..ml] / x[N-mr+1..N] == the first ml / last mr
    // in-bounds elements (slice with length 0 yields an empty array)
    val nIn = org.apache.spark.sql.functions.size(arrIn) // (`size` is the param)
    val padded = concat(
      slice(arrIn, lit(1), ml),
      arrIn,
      slice(arrIn, nIn - mr + 1, mr))
    df.withColumn("median_value",
      element_at(array_sort(padded), kl + 1))
  }

  /** Large-window exact sliding median as ONE sorted pass per key:
    * `repartition(key) + sortWithinPartitions + mapPartitions` with a
    * dual-heap (lazy-deletion) order-statistic structure — O(log k) per
    * row where the window-composition form ([[slidingMedian]]'s
    * collect_list fallback) re-buffers, re-sorts and re-allocates the
    * full 2k+1 frame per row, O(k log k) with a large constant.
    *
    * Same semantics as [[slidingMedian]] (SQL quantile_cont(0.5):
    * shrinking frames at partition edges, linear interpolation for even
    * counts, nulls skipped, all-null frame → null median).
    *
    * This is the library's only mapPartitions operator, and it exists
    * because the measurement SURVEY §7.3 deferred came back decisive at
    * large k (SCALE.md round 16: ≥6× at window 101 on 10-30 M rows);
    * [[slidingMedian]]'s lag/lead form is still the pick for the
    * reference's own k ≤ 8 smoothing windows. Shuffle count is identical
    * (the one hash exchange on `key`); per-key data must fit a task —
    * the same bound every ordered-window operator carries.
    *
    * `keyCols`/`orderCols` are column NAMES (the sort and the per-key
    * scan must agree on the physical layout, so expressions are not
    * accepted). `value` must be a DoubleType column. Appends
    * `median_value`. Ref: postprocessing.py:27-30 (scipy median_filter
    * smoothing; quantile_cont edge semantics as in [[slidingMedian]]). */
  def slidingMedianPartitioned(df: DataFrame, keyCols: Seq[String],
                               orderCols: Seq[String], valueCol: String,
                               k: Int): DataFrame = {
    require(k >= 0)
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        "median_value", org.apache.spark.sql.types.DoubleType, nullable = true))
    val valueIdx = df.schema.fieldIndex(valueCol)
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val sorted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    sorted.mapPartitions { rows =>
      // consecutive same-key runs (the sort guarantees adjacency);
      // buffer one key's rows, emit its medians, move on — memory is
      // bounded by the largest single key, as in any window operator
      val it = rows.buffered
      new Iterator[org.apache.spark.sql.Row] {
        private var out: Iterator[org.apache.spark.sql.Row] = Iterator.empty
        def hasNext: Boolean = out.hasNext || it.hasNext
        def next(): org.apache.spark.sql.Row = {
          if (!out.hasNext) {
            val keyOf = (r: org.apache.spark.sql.Row) => keyIdx.map(r.get)
            val k0 = keyOf(it.head)
            val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
            while (it.hasNext && keyOf(it.head) == k0) buf += it.next()
            out = emitKey(buf, valueIdx, k).iterator
          }
          out.next()
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** One key's rows → rows + sliding median, dual-heap sweep. */
  private def emitKey(rows: scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row],
                      valueIdx: Int, k: Int): Seq[org.apache.spark.sql.Row] = {
    val n = rows.length
    val heap = new DualMedianHeap
    var added = -1 // highest row index whose value is in the heap
    var removed = 0 // lowest row index not yet evicted
    val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](n)
    var i = 0
    while (i < n) {
      while (added < math.min(n - 1, i + k)) {
        added += 1
        val r = rows(added)
        if (!r.isNullAt(valueIdx)) heap.add(r.getDouble(valueIdx))
      }
      while (removed < i - k) {
        val r = rows(removed)
        if (!r.isNullAt(valueIdx)) heap.remove(r.getDouble(valueIdx))
        removed += 1
      }
      val med = heap.medianOrNull
      out += org.apache.spark.sql.Row.fromSeq(rows(i).toSeq :+ med)
      i += 1
    }
    out.toSeq
  }

  /** Order-statistic multiset for a sliding frame: max-heap `lo` holds
    * the lower half (its top = lower middle), min-heap `hi` the upper;
    * removals anywhere in the frame are deferred (lazy deletion) until
    * the value surfaces at a top. Invariant: loSize == hiSize or
    * loSize == hiSize + 1, counting live elements only. */
  private final class DualMedianHeap {
    private val lo = new java.util.PriorityQueue[java.lang.Double](
      java.util.Collections.reverseOrder[java.lang.Double]())
    private val hi = new java.util.PriorityQueue[java.lang.Double]()
    private val delayed = new java.util.HashMap[java.lang.Double, Integer]()
    private var loSize = 0
    private var hiSize = 0

    private def prune(h: java.util.PriorityQueue[java.lang.Double]): Unit = {
      while (!h.isEmpty && delayed.getOrDefault(h.peek, 0) > 0) {
        val v = h.poll()
        val c = delayed.get(v) - 1
        if (c == 0) delayed.remove(v) else delayed.put(v, c)
      }
    }

    private def rebalance(): Unit = {
      if (loSize > hiSize + 1) {
        prune(lo); hi.add(lo.poll()); loSize -= 1; hiSize += 1; prune(lo)
      } else if (loSize < hiSize) {
        prune(hi); lo.add(hi.poll()); hiSize -= 1; loSize += 1; prune(hi)
      }
    }

    def add(v: Double): Unit = {
      prune(lo)
      if (lo.isEmpty || v <= lo.peek) { lo.add(v); loSize += 1 }
      else { hi.add(v); hiSize += 1 }
      rebalance()
    }

    def remove(v: Double): Unit = {
      // decide which half the value lives in by comparing to lo's top
      prune(lo)
      delayed.merge(v, 1, (a, b) => a + b)
      if (!lo.isEmpty && v <= lo.peek) { loSize -= 1; prune(lo) }
      else { hiSize -= 1; prune(hi) }
      rebalance()
    }

    /** quantile_cont(0.5) of the live multiset; null when empty. */
    def medianOrNull: java.lang.Double = {
      if (loSize + hiSize == 0) null
      else {
        prune(lo); prune(hi)
        if (((loSize + hiSize) & 1) == 1) lo.peek
        else (lo.peek + hi.peek) / 2.0
      }
    }
  }
}
