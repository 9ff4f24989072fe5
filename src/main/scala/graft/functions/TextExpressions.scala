package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash-64 over a token array (north-star dedup, SURVEY.md §7.5).
  *
  * Semantics: each token is hashed with xxHash64 (seed 42 — identical to
  * Spark's `xxhash64` builtin); every one of the 64 bit positions
  * accumulates a +1/−1 vote per token; positive-count bits set the
  * fingerprint bit.
  *
  * This replaces the pure-HOF formulation (nested
  * `aggregate`/`zip_with`/`sequence` lambdas), which is interpreted and
  * allocates two 64-element arrays PER TOKEN. Here the 64 counters live in
  * one stack array per row inside whole-stage codegen — the per-document
  * signature pass is the map-side cost of SimHash dedup at corpus scale, so
  * it must be allocation-free.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val fp = ctx.freshName("fp")
      s"""
        int[] $counts = new int[64];
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
            long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
              $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
            for (int $b = 0; $b < 64; $b++) {
              if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
            }
          }
        }
        long $fp = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($counts[$b] > 0) $fp |= (1L << $b);
        }
        ${ev.value} = $fp;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native MinHash signature over a shingle array: `numHashes` minimum values
  * of independent hash functions, computed in ONE pass — each shingle is
  * string-hashed once (xxHash64 seed 42), then the `numHashes` per-function
  * values derive from cheap SplitMix64 integer mixing of that base hash
  * (the standard one-hash-k-mixes MinHash construction; mixing constants
  * are the published SplitMix64 ones). Replaces `numHashes` interpreted
  * `transform` lambdas, each of which allocated an intermediate array per
  * row.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string> or array<long> (pre-hashed), got $other")
    }

  private def elemIsLong: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val preHashed = elemIsLong
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base =
          if (preHashed) arr.getLong(i)
          else {
            val s = arr.getUTF8String(i)
            XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
          }
        var j = 0
        while (j < numHashes) {
          var z = base + (j + 1).toLong * 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z = z ^ (z >>> 31)
          if (z < mins(j)) mins(j) = z
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val z = ctx.freshName("z")
      s"""
        long[] $mins = new long[$numHashes];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            ${
              if (elemIsLong) s"long $base = $a.getLong($i);"
              else s"""org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
            long $base = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
              $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);"""
            }
            for (int $j = 0; $j < $numHashes; $j++) {
              long $z = $base + ((long)($j + 1)) * 0x9e3779b97f4a7c15L;
              $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
              $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
              $z = $z ^ ($z >>> 31);
              if ($z < $mins[$j]) $mins[$j] = $z;
            }
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native hashed word-k-shingles: each window of `k` consecutive tokens
  * yields one 64-bit identity (xxHash64 of each token chained through the
  * window). Shorter-than-k documents yield one hash over all tokens —
  * matching [[graft.ops.Dedup.shingles]]' whole-text fallback.
  *
  * Hashed shingle identities make downstream set algebra
  * (distinct/intersect/union for Jaccard) run over primitive longs instead
  * of strings; Jaccard VALUES are unchanged versus string shingles short of
  * a 2^-64 hash collision. The string-building HOF formulation
  * (`transform`+`slice`+`array_join`) is interpreted and dominated the
  * whole MinHash pipeline; this is one codegen'd pass.
  */
case class ShingleHash(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hash expects array<string>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (arr.isNullAt(i)) 0L
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      i += 1
    }
    val out =
      if (n == 0) Array.empty[Long]
      else if (n < k) {
        var h = 42L
        var j = 0
        while (j < n) { h = XXH64.hashLong(th(j), h); j += 1 }
        Array(h)
      } else {
        val m = n - k + 1
        val o = new Array[Long](m)
        var s = 0
        while (s < m) {
          var h = 42L
          var j = s
          while (j < s + k) { h = XXH64.hashLong(th(j), h); j += 1 }
          o(s) = h
          s += 1
        }
        o
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val th = ctx.freshName("th")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val str = ctx.freshName("str")
      s"""
        int $n = $a.numElements();
        long[] $th = new long[$n];
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) { $th[$i] = 0L; }
          else {
            org.apache.spark.unsafe.types.UTF8String $str = $a.getUTF8String($i);
            $th[$i] = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
              $str.getBaseObject(), $str.getBaseOffset(), $str.numBytes(), 42L);
          }
        }
        long[] $out;
        if ($n == 0) { $out = new long[0]; }
        else if ($n < $k) {
          long $h = 42L;
          for (int $j = 0; $j < $n; $j++) { $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($th[$j], $h); }
          $out = new long[]{$h};
        } else {
          int $m = $n - $k + 1;
          $out = new long[$m];
          for (int $s = 0; $s < $m; $s++) {
            long $h = 42L;
            for (int $j = $s; $j < $s + $k; $j++) { $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($th[$j], $h); }
            $out[$s] = $h;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native winnowing selection (Schleimer–Wilkerson–Aiken 2003): over an
  * array of gram hashes, the DISTINCT minima of every `w`-wide sliding
  * window, in first-occurrence order — bit-identical to
  * `array_distinct(transform(sequence(0, max(n-w, 0)), i ->
  * array_min(slice(grams, i+1, w))))` but one codegen'd pass with no
  * per-window slice allocation (the HOF form allocates a w-element array
  * per gram and was the round-7 bench's slowest map-side operator).
  * Arrays shorter than the window yield the single whole-array minimum.
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "winnow window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_select expects array<bigint>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n > 0) {
      val m = math.max(n - w, 0)
      var i = 0
      while (i <= m) {
        var min = arr.getLong(i)
        var j = i + 1
        val end = math.min(i + w, n)
        while (j < end) {
          val x = arr.getLong(j)
          if (x < min) min = x
          j += 1
        }
        seen.add(min)
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val end = ctx.freshName("end")
      val min = ctx.freshName("min")
      val x = ctx.freshName("x")
      val seen = ctx.freshName("seen")
      val out = ctx.freshName("out")
      val it = ctx.freshName("it")
      val p = ctx.freshName("p")
      s"""
        int $n = $a.numElements();
        java.util.LinkedHashSet<Long> $seen = new java.util.LinkedHashSet<Long>();
        if ($n > 0) {
          int $m = Math.max($n - $w, 0);
          for (int $i = 0; $i <= $m; $i++) {
            long $min = $a.getLong($i);
            int $end = Math.min($i + $w, $n);
            for (int $j = $i + 1; $j < $end; $j++) {
              long $x = $a.getLong($j);
              if ($x < $min) $min = $x;
            }
            $seen.add($min);
          }
        }
        long[] $out = new long[$seen.size()];
        java.util.Iterator<Long> $it = $seen.iterator();
        int $p = 0;
        while ($it.hasNext()) { $out[$p] = ((Long) $it.next()).longValue(); $p++; }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native stopword-hit count: how many tokens (duplicates included) of the
  * input array appear in `words`. Replaces the interpreted
  * `filter(tokens, t -> t.isin(...))` HOF (per-token lambda dispatch, an
  * allocated intermediate array per row) with one codegen'd hash-set pass.
  * Quality scoring runs this per document over the whole corpus — it is
  * map-side cost at 100 TB and must stay inside whole-stage codegen.
  */
/** Count of code points NOT in `[a-zA-Z0-9 ]` — value-identical to
  * `length(regexp_replace(text, "[a-zA-Z0-9 ]", ""))` (matched ASCII chars
  * are single bytes in UTF-8 and single code units in UTF-16, and every
  * unmatched code point — including astral ones — counts exactly once on
  * both sides), WITHOUT the regex engine or the replaced-string
  * allocation: one byte scan (non-ASCII lead/continuation bytes are
  * ≥ 0x80, so an ASCII-set byte test never miscounts inside a multi-byte
  * sequence) subtracted from `numChars`. The punctuation-ratio leg of
  * [[graft.ops.TextAnalysis.qualityScore]] — the ×100 probe measured the
  * regex form dominating the quality cascade (BASELINE.md §r17).
  */
case class NonAlnumSpaceCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"non_alnum_space_count expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    var matched = 0
    var i = 0
    val nb = s.numBytes()
    while (i < nb) {
      val b = s.getByte(i)
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9') || b == ' ') matched += 1
      i += 1
    }
    s.numChars() - matched
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val nb = ctx.freshName("nb")
      val b = ctx.freshName("b")
      val matched = ctx.freshName("matched")
      s"""
        int $matched = 0;
        int $nb = $a.numBytes();
        for (int $i = 0; $i < $nb; $i++) {
          byte $b = $a.getByte($i);
          if (($b >= 'a' && $b <= 'z') || ($b >= 'A' && $b <= 'Z') ||
              ($b >= '0' && $b <= '9') || $b == ' ') $matched++;
        }
        ${ev.value} = $a.numChars() - $matched;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StopwordCount(child: Expression, words: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"stopword_count expects array<string>, got $other")
    }

  // UTF8String has value-based equals/hashCode — a HashSet of them is the
  // O(1) membership test; built once per task, shared via a reference obj.
  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var hits = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && wordSet.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val hits = ctx.freshName("hits")
      s"""
        int $hits = 0;
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $hits++;
        }
        ${ev.value} = $hits;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native single-pass language ID over a token array: per-language stopword
  * hit counts (a token may belong to several languages' lists — membership
  * is a token→bitmask lookup), winner = alphabetically-first language with
  * the maximal non-zero count, else `und`.
  *
  * Replaces the composed-Column formulation (4 languages × interpreted
  * `filter` HOF, each evaluated twice through `greatest` + the `when`
  * chain = 8 lambda-dispatch passes per document — the slowest query of
  * the round-2 bench at 10× the cost of any other text op). `langs` must be
  * sorted by language code; ONE pass per document, no allocation.
  */
case class LangIdExpr(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression {
  require(langs.nonEmpty && langs.size <= 31, "1..31 language lists")
  require(langs.map(_._1) == langs.map(_._1).sorted,
    "langs must be sorted by code (alphabetical tie-break contract)")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lang_id expects array<string>, got $other")
    }

  @transient private lazy val maskMap: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    langs.zipWithIndex.foreach { case ((_, words), li) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << li)))
      }
    }
    m
  }

  @transient private lazy val langNames: Array[UTF8String] =
    langs.map(l => UTF8String.fromString(l._1)).toArray

  @transient private lazy val und: UTF8String = UTF8String.fromString("und")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](langs.size)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val mask = maskMap.get(arr.getUTF8String(i))
        if (mask != null) {
          var m = mask.intValue()
          while (m != 0) {
            val li = java.lang.Integer.numberOfTrailingZeros(m)
            counts(li) += 1
            m &= m - 1
          }
        }
      }
      i += 1
    }
    var best = 0
    var bestIdx = -1
    var li = 0
    while (li < counts.length) {
      if (counts(li) > best) { best = counts(li); bestIdx = li }
      li += 1
    }
    if (bestIdx < 0) und else langNames(bestIdx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("maskMap", maskMap, "java.util.HashMap")
    val namesRef = ctx.addReferenceObj("langNames", langNames,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val undRef = ctx.addReferenceObj("und", und,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mask = ctx.freshName("mask")
      val m = ctx.freshName("m")
      val li = ctx.freshName("li")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      s"""
        int[] $counts = new int[${langs.size}];
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            Integer $mask = (Integer) $mapRef.get($a.getUTF8String($i));
            if ($mask != null) {
              int $m = $mask.intValue();
              while ($m != 0) {
                $counts[Integer.numberOfTrailingZeros($m)]++;
                $m &= $m - 1;
              }
            }
          }
        }
        int $best = 0;
        int $bestIdx = -1;
        for (int $li = 0; $li < ${langs.size}; $li++) {
          if ($counts[$li] > $best) { $best = $counts[$li]; $bestIdx = $li; }
        }
        ${ev.value} = ($bestIdx < 0) ? $undRef : $namesRef[$bestIdx];
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native intersection-size of two SORTED long arrays (ascending, no null
  * elements): one O(n+m) merge pass, no allocation.
  *
  * `size(array_intersect(a, b))` builds a per-row hash set AND materializes
  * the intersection array that the Jaccard formula immediately reduces to a
  * count — per-candidate-pair cost in every near-dup verify step
  * (ngram-Jaccard brute force, MinHash+LSH verification), which is the
  * volume term of dedup at corpus scale. Callers sort each document's
  * shingle set ONCE (`array_sort`, O(s log s) per document); the merge then
  * runs per PAIR, where the savings multiply.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"intersect_count_sorted expects two array<long>, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var hits = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { hits += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val hits = ctx.freshName("hits")
      s"""
        int $n = $a.numElements();
        int $m = $b.numElements();
        int $i = 0, $j = 0, $hits = 0;
        while ($i < $n && $j < $m) {
          long $x = $a.getLong($i);
          long $y = $b.getLong($j);
          if ($x == $y) { $hits++; $i++; $j++; }
          else if ($x < $y) { $i++; }
          else { $j++; }
        }
        ${ev.value} = $hits;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native word n-grams of a raw text column as STRINGS (array<string>):
  * whitespace-tokenize (any run of ASCII whitespace separates tokens; no
  * empty tokens) and emit every window of `n` consecutive tokens joined by
  * a single space. Documents shorter than `n` tokens yield an empty array.
  *
  * String grams (not hashes) are the decontamination contract — an external
  * SQL engine must compute the identical overlap set (see
  * [[graft.ops.Decontaminate]]). The HOF formulation
  * (`split`+`filter`+`transform`+`slice`+`array_join`) is interpreted —
  * five allocated intermediates and per-window lambda dispatch; this is one
  * byte-level pass (token boundaries found directly on the UTF-8 bytes —
  * multi-byte code points never collide with ASCII whitespace) with exactly
  * one allocation per output gram. Gram extraction is the map-side cost of
  * corpus decontamination, so it must stay codegen-resident.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    WordNgrams.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      // one static call keeps the generated method tiny (JIT-friendly) and
      // the byte-scan logic single-sourced with the interpreted path
      s"${ev.value} = graft.functions.WordNgrams$$.MODULE$$.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  // token separators = RE2's \s class ([\t\n\f\r ]) so the DuckDB oracle's
  // string_split_regex('\s+') produces the IDENTICAL overlap set. Java
  // regex \s additionally matches vertical tab (0x0B) — deliberately NOT
  // whitespace here (and excluded from the \s-free char classes used by
  // the HOF/streaming tokenizers) to keep the cross-engine contract exact.
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'

  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // token boundary scan: starts/ends as parallel growable int arrays
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var m = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        val s = i
        while (i < len && !isWs(bytes(i))) i += 1
        if (m == starts.length) {
          starts = java.util.Arrays.copyOf(starts, m * 2)
          ends = java.util.Arrays.copyOf(ends, m * 2)
        }
        starts(m) = s
        ends(m) = i
        m += 1
      }
    }
    if (m < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var g = 0
    while (g <= m - n) {
      var glen = n - 1 // single-space separators
      var j = g
      while (j < g + n) { glen += ends(j) - starts(j); j += 1 }
      val gb = new Array[Byte](glen)
      var pos = 0
      j = g
      while (j < g + n) {
        if (j > g) { gb(pos) = ' '; pos += 1 }
        val tl = ends(j) - starts(j)
        System.arraycopy(bytes, starts(j), gb, pos, tl)
        pos += tl
        j += 1
      }
      out(g) = UTF8String.fromBytes(gb)
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Shannon entropy (nats) of a string's character distribution — the
  * "character diversity" quality signal (low entropy flags repeated-char /
  * keyboard-mash / boilerplate documents; a standard C4/Gopher-family
  * heuristic complement). H = −Σ_c p(c)·ln p(c) over the UTF-16 chars of
  * the value; empty/NULL-free input of length 0 scores 0.0.
  *
  * Scale: per-row scalar inside whole-stage codegen — the quality panel
  * adds NO explode/groupBy (the naive formulation shuffles one row per
  * CHARACTER, i.e. ~100 TB of intermediate for a 100 TB corpus). The char
  * histogram is a sort + run-length scan of one per-row array, so the sum
  * order is char-sorted and deterministic across partitionings.
  *
  * Cross-engine note: chars are UTF-16 units; identical to code-point
  * entropy for BMP text (the oracle's DuckDB formulation counts code
  * points).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    CharEntropy.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CharEntropy$$.MODULE$$.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  def compute(text: UTF8String): Double = {
    val chars = text.toString.toCharArray
    val n = chars.length
    if (n == 0) return 0.0
    java.util.Arrays.sort(chars)
    var h = 0.0
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && chars(j) == chars(i)) j += 1
      val p = (j - i).toDouble / n
      h -= p * math.log(p)
      i = j
    }
    h
  }
}

object TextFunctions {
  /** SimHash-64 fingerprint of a token-array column. */
  def simhash64(tokens: Column): Column =
    ColumnInterop.column(SimHash64(ColumnInterop.expression(tokens)))

  /** MinHash signature (array<long> of length numHashes) of a shingle-array
    * column (array<string> or pre-hashed array<long>).
    */
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    ColumnInterop.column(MinHashSig(ColumnInterop.expression(shingles), numHashes))

  /** Hashed word-k-shingles (array<long>) of a token-array column. */
  def shingle_hash(tokens: Column, k: Int): Column =
    ColumnInterop.column(ShingleHash(ColumnInterop.expression(tokens), k))

  /** Distinct sliding-window minima of a hash array (winnowing selection). */
  def winnow_select(hashes: Column, w: Int): Column =
    ColumnInterop.column(WinnowSelect(ColumnInterop.expression(hashes), w))

  /** Count of tokens (duplicates included) that appear in `words`. */
  def stopword_count(tokens: Column, words: Seq[String]): Column =
    ColumnInterop.column(StopwordCount(ColumnInterop.expression(tokens), words))

  /** Code points outside `[a-zA-Z0-9 ]` — the regex-free punctuation
    * counter (≡ `length(regexp_replace(text, "[a-zA-Z0-9 ]", ""))`).
    */
  def non_alnum_space_count(text: Column): Column =
    ColumnInterop.column(NonAlnumSpaceCount(ColumnInterop.expression(text)))

  /** Single-pass language ID over a token array; `langs` sorted by code. */
  def lang_id(tokens: Column, langs: Seq[(String, Seq[String])]): Column =
    ColumnInterop.column(LangIdExpr(ColumnInterop.expression(tokens), langs))

  /** Intersection size of two sorted (ascending, non-null) long arrays. */
  def intersect_count_sorted(a: Column, b: Column): Column =
    ColumnInterop.column(IntersectCountSorted(
      ColumnInterop.expression(a), ColumnInterop.expression(b)))

  /** Word n-grams of a raw text column as space-joined strings. */
  def word_ngrams(text: Column, n: Int): Column =
    ColumnInterop.column(WordNgrams(ColumnInterop.expression(text), n))

  /** Shannon entropy (nats) of a string's character distribution. */
  def char_entropy(text: Column): Column =
    ColumnInterop.column(CharEntropy(ColumnInterop.expression(text)))

  /** Bloom-filter membership probe over a serialized
    * `org.apache.spark.util.sketch.BloomFilter` (the format
    * `bloom_filter_agg` emits). `bloom` must be a CONSTANT (a `lit` of the
    * collected sketch bytes) — the expression deserializes it once per
    * task, not per row; `hashed` is the `xxhash64`-hashed probe value,
    * matching the hash the aggregate side inserted. Spark registers the
    * aggregate (`bloom_filter_agg`) but not the probe in its public SQL
    * registry, hence this wrapper over the Catalyst expression the
    * engine's own runtime row-level filtering uses.
    */
  def might_contain(bloom: Column, hashed: Column): Column =
    ColumnInterop.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnInterop.expression(bloom), ColumnInterop.expression(hashed)))

  /** Distributed Bloom-filter build over an `xxhash64`-hashed long column:
    * the aggregate Spark's runtime row-level filtering plants on the build
    * side of a join (internal registry only — not reachable as SQL
    * `bloom_filter_agg` from the public session), exposed as a Column.
    * Emits one binary row: the serialized sketch [[might_contain]] probes.
    */
  def bloom_filter_agg(hashed: Column, estimatedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    ColumnInterop.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ColumnInterop.expression(hashed), Literal(estimatedItems), Literal(numBits))
        .toAggregateExpression())
  }
}
