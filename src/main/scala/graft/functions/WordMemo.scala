package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** word -> encoded-tokens memo shared by the three tokenizer encode
  * expressions ([[BpeEncodeText]], [[WordPieceEncodeText]],
  * [[UnigramEncodeText]]). Corpus word frequencies are Zipfian, so the
  * distinct-word set is orders of magnitude smaller than the word
  * stream — memoizing turns per-OCCURRENCE segmentation into
  * per-DISTINCT-WORD (measured 8× on the ×100 scale corpus; the same
  * cache HF tokenizers keep). Segmentation is a pure function of the
  * word, so cache state never changes output.
  *
  * Scope: tasks deserialize their OWN copy of the codegen references, so
  * each task carries its own memo (a `@transient lazy val` in the
  * expression) — the map never sees cross-task writes, but
  * ConcurrentHashMap keeps even an unexpected sharing safe. Size-capped:
  * once full, unseen words encode uncached (correctness unaffected);
  * worst case is ~CacheCap small strings per task. UTF8String values are
  * immutable and safely shared across output rows.
  */
private[functions] final class WordMemo(cap: Int = 1 << 16) {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()
  // filled-slot counter: ConcurrentHashMap.size() scans the table, and a
  // warm cache paid that scan on EVERY miss; the bound stays advisory
  // (concurrent misses may overshoot by the thread count), correctness is
  // unaffected either way (pure function, identical cached or not)
  private val filled = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Cached tokens of `word`, or `encode`'s result (cached while room). */
  def getOrEncode(word: String)(encode: String => Array[UTF8String]): Array[UTF8String] = {
    var toks = cache.get(word)
    if (toks == null) {
      toks = encode(word)
      if (filled.get < cap && cache.putIfAbsent(word, toks) == null)
        filled.incrementAndGet()
    }
    toks
  }
}
