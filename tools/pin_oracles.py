#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/PinnedOracles.scala from a Verify dump.

The Spark-side-hash queries (train_test_split, stratified_sample,
dedup_simhash, text_fingerprint, multimodal_*) are deterministic but
not expressible
in DuckDB SQL (xxhash64 / SimHash / the ImageIO + stub decoders are Spark/JVM-side).
Their oracles are therefore PINNED literal VALUES, captured from a verified
run at sf0.01 (the driver's correctness scale) and independently
cross-checked in the specs (HOF bit-equality for simhash, driver-side Scala
recomputation for fingerprint/decoder/split). A pin converts the driver's
rows-only check into an exact value regression gate.

Usage: after `runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_sf001`
(and ONLY once its outputs are believed correct):

    python3 tools/pin_oracles.py /tmp/verify_sf001
"""
import sys
import duckdb


PINS = {
    # name -> (columns with casts, order by)
    "train_test_split": (["split VARCHAR", "n BIGINT"], "split"),
    "dedup_simhash": (["id_a BIGINT", "id_b BIGINT", "hamming BIGINT"], "id_a, id_b"),
    "text_fingerprint": (["doc_id BIGINT", "fp BIGINT"], "doc_id"),
    "text_winnow": (["doc_id BIGINT", "n_fp BIGINT", "fp_xor BIGINT"], "doc_id"),
    "dedup_winnow_pairs": (["id_a BIGINT", "id_b BIGINT", "n_shared BIGINT"], "id_a, id_b"),
    "multimodal_decode": (["doc_id BIGINT", "format VARCHAR", "n_features BIGINT", "feat_sum DOUBLE"], "doc_id"),
    "multimodal_resize": (["doc_id BIGINT", "out_w INTEGER", "out_h INTEGER", "feat_sum DOUBLE"], "doc_id"),
    "stratified_sample": (["doc_id BIGINT", "lang VARCHAR"], "doc_id"),
    "weighted_sample": (["doc_id BIGINT", "n_chars BIGINT", "sample_key DOUBLE"], "doc_id"),
    "weighted_sample_per_stratum": (["doc_id BIGINT", "source VARCHAR", "n_chars BIGINT",
                                     "sample_key DOUBLE"], "doc_id"),
    "multimodal_frames": (["doc_id BIGINT", "frame_idx INTEGER", "frame_hash BIGINT"], "doc_id, frame_idx"),
    # ImageIO decode + aHash are JVM-side; clone recovery + hash-recompute
    # cross-checked in MultimodalSpec
    "multimodal_phash_dedup": (["id_a BIGINT", "id_b BIGINT", "hamming BIGINT"], "id_a, id_b"),
    "multimodal_phash_corpus": (["doc_id BIGINT", "phash BIGINT"], "doc_id"),
    # Count-Min hashes are JVM-side; one-sided error bound asserted in
    # SketchesSpec
    "heavy_hitters": (["token VARCHAR", "exact_n BIGINT", "est_n BIGINT"], "exact_n DESC, token"),
    "source_mix": (["source VARCHAR", "n BIGINT"], "source"),
    # BPE is iterative (not SQL-expressible); deterministic by the
    # count-desc/lhs/rhs tie-break — path-equality + hand-computed merges
    # cross-checked in BpeSpec
    "bpe_train": (["merge_rank BIGINT", "lhs VARCHAR", "rhs VARCHAR"], "merge_rank"),
    "bpe_encode": (["doc_id BIGINT", "n_bpe_tokens BIGINT", "tokens_head VARCHAR"], "doc_id"),
    # greedy longest-match is iterative (native expression); driver-side
    # greedy recomputation cross-checked in WordPieceSpec
    "wordpiece_encode": (["doc_id BIGINT", "n_wp_tokens BIGINT", "pieces_head VARCHAR"], "doc_id"),
    # DEFLATE byte counts are zlib-build-side; the repetitive<prose<random
    # ordering is cross-checked in TextAnalysisSpec
    "text_compression_ratio": (["doc_id BIGINT", "n_bytes BIGINT", "deflate_bytes BIGINT", "compress_ratio DOUBLE"], "doc_id"),
    # eigensolve is Spark/JVM-side; sign-fixed deterministic components,
    # brute-force eigenpair residual + projection parity in PcaSpec
    "embedding_pca": (["vec_id BIGINT", "pc1 DOUBLE", "pc2 DOUBLE", "pc3 DOUBLE", "pc4 DOUBLE"], "vec_id"),
    # DDL synthesis is JVM-side (type lattice + dialect quoting);
    # deterministic strings, round-trip parse asserted in DdlSpec
    "m4_ddl": (["dialect VARCHAR", "ddl VARCHAR"], "dialect"),
    "m5_type_lattice": (["spark_type VARCHAR", "dialect VARCHAR", "sql_type VARCHAR"],
                        "spark_type, dialect"),
    # LSH planes are JVM-side hashes; the declared query is PURE ANN (no
    # exhaustive side in its plan) — recall evidence lives in the bounded
    # bitext_recall_audit pin below, and BitextSpec asserts id-level
    # recall >= 0.95 and exact sim parity first-principles
    "bitext_mine_ann": (["src_id BIGINT", "tgt_id BIGINT", "sim DOUBLE",
                         "margin DOUBLE"], "src_id"),
    # the capped-sample ANN-vs-exhaustive agreement record (the
    # knn_recall_audit pattern applied to the bitext miner)
    "bitext_recall_audit": (["n_src BIGINT", "n_agree BIGINT", "agreement DOUBLE"],
                            "n_src"),
    # LSH band hashes are JVM-side; the exact side (prefix join) and the
    # verified-candidate LSH side both carry green oracles of their own —
    # this pin is the measured recall/precision record at the declared
    # band parameters (precision = 1.0 is asserted structurally: lsh
    # verifies candidates on true Jaccard)
    "dedup_lsh_recall_audit": (["n_exact BIGINT", "n_lsh BIGINT", "n_common BIGINT",
                                "recall DOUBLE", "precision DOUBLE"], "n_exact"),
    # KMV minima are JVM-side xxhash64 (deterministic, no RNG); estimator
    # exactness-when-unsaturated + trailing-merge algebra in KmvSpec
    "audience_trailing_kmv": (["bucket VARCHAR", "distinct_est DOUBLE",
                               "trailing_est DOUBLE", "n_buckets BIGINT"], "bucket"),
    # HLL++ registers are JVM-side but order-insensitive (register max) →
    # deterministic; the pin carries the sketch-vs-exact error record
    "corpus_profile_sketch_error": (["source VARCHAR", "n_distinct_exact BIGINT",
                                     "n_distinct_hll BIGINT", "rel_err DOUBLE"], "source"),
    # hand-parsed RIFF/AVI decode is pure JVM byte arithmetic; driver-side
    # byte recomputation cross-checked in MultimodalSpec
    "multimodal_video_frames": (["doc_id BIGINT", "frame_idx INTEGER", "frame_no INTEGER",
                                 "mean_luma DOUBLE", "frame_hash BIGINT"], "doc_id, frame_idx"),
    "multimodal_video_decode": (["doc_id BIGINT", "n_features BIGINT", "bin_first DOUBLE",
                                 "bin_last DOUBLE", "feat_sum DOUBLE"], "doc_id"),
    # MJPEG frames decode through the JRE's ImageIO (JPEG codec is
    # JVM-side); ramp monotonicity + ImageIO recomputation in MultimodalSpec
    "multimodal_video_mjpeg": (["doc_id BIGINT", "frame_idx INTEGER", "frame_no INTEGER",
                                "mean_luma DOUBLE", "frame_hash BIGINT"], "doc_id, frame_idx"),
    # xxhash64 minima are JVM-side; estimator accuracy + exactness-when-
    # unsaturated cross-checked in KmvSpec, exact companions in-record
    "audience_overlap_sketch": (["grp_a VARCHAR", "grp_b VARCHAR", "jaccard_est DOUBLE",
                                 "n_common_est DOUBLE", "n_common_exact BIGINT",
                                 "rel_err DOUBLE"], "grp_a, grp_b"),
    # the difference-completed matrix and the one-aggregate multi-way
    # union share audience_overlap_sketch's rationale (exact companions
    # ride in-row; estimator algebra cross-checked in KmvSpec)
    "audience_overlap_matrix": (["grp_a VARCHAR", "grp_b VARCHAR", "jaccard_est DOUBLE",
                                 "n_common_est DOUBLE", "n_diff_ab_est DOUBLE",
                                 "n_diff_ba_est DOUBLE", "n_diff_ab_exact BIGINT",
                                 "n_diff_ba_exact BIGINT"], "grp_a, grp_b"),
    "audience_union_sketch": (["n_groups BIGINT", "n_union_est DOUBLE",
                               "n_union_exact BIGINT", "rel_err DOUBLE"], "n_groups"),
    # the MMR greedy is iterative (not SQL-expressible); driver-side
    # recomputation + diversity/order-invariance properties in MmrSpec
    "doc_retrieval_mmr": (["q_id BIGINT", "mmr_rank BIGINT", "doc_id BIGINT",
                           "mmr DOUBLE"], "q_id, mmr_rank"),
    # MinHash + phash edges are JVM-side; both edge families carry their
    # own green pinned queries (dedup_minhash_lsh, multimodal_phash_*)
    "multimodal_joint_dedup": (["doc_id BIGINT"], "doc_id"),
    "multimodal_phash_oversized": (["band BIGINT", "n_ids BIGINT"], "band"),
    # BPE token counts are JVM-iterative; each composed stage carries its
    # own green oracle (quality_filter SQL, bpe_encode pinned,
    # source_token_budget SQL, pack_chunks SQL)
    "e2e_tokenize_pack": (["doc_id BIGINT", "source VARCHAR", "n_tokens BIGINT",
                           "start_tok BIGINT", "chunk_start BIGINT",
                           "chunk_end BIGINT"], "doc_id"),
    # frozen-model append + serve is deterministic (same k-means training
    # on the base slice, hash-free encode) but the PQ/IVF model is
    # JVM-side; appended-row retrievability is the planted-clone test in
    # IvfPqIndexSpec
    "knn_index_append": (["q_id BIGINT", "rank BIGINT", "n_id BIGINT", "sim DOUBLE"],
                         "q_id, rank"),
    # count-EM is iterative (not SQL-expressible); hand-computed Viterbi +
    # driver-side recomputation cross-checked in UnigramSpec
    "unigram_train": (["piece VARCHAR", "piece_id INTEGER", "logprob DOUBLE"], "piece_id"),
    "unigram_encode": (["doc_id BIGINT", "n_ug_tokens BIGINT", "pieces_head VARCHAR"], "doc_id"),
    # The ANN serve paths are approximate by design but seeded-
    # deterministic (LSH planes from xxhash64, IVF/PQ k-means seeded from
    # the lowest vec_ids) — the pin freezes the serve output at the
    # declared parameters; ACCURACY evidence lives in the exhaustive
    # knn_recall_audit companion (full DuckDB oracle) and SimilaritySpec's
    # recall assertions. A pin regression = the model/serve path changed.
    "knn_lsh_ann": (["q_id BIGINT", "n_id BIGINT", "sim DOUBLE", "rank BIGINT"], "q_id, rank"),
    "knn_ivf_ann": (["q_id BIGINT", "n_id BIGINT", "sim DOUBLE", "rank BIGINT"], "q_id, rank"),
    "knn_pq_ann": (["q_id BIGINT", "n_id BIGINT", "sim DOUBLE", "rank BIGINT"], "q_id, rank"),
    "knn_ivfpq_ann": (["q_id BIGINT", "n_id BIGINT", "sim DOUBLE", "rank BIGINT"], "q_id, rank"),
    # write → read → serve equality with the in-memory model is asserted
    # in IvfPqIndexSpec; the pin freezes the persisted serve itself
    "knn_ivfpq_persisted": (["q_id BIGINT", "n_id BIGINT", "sim DOUBLE", "rank BIGINT"], "q_id, rank"),
    # the erased-index serve (frozen model, list anti-join); the
    # planted-clone erasure proof is in IvfPqIndexSpec — the pin freezes
    # the post-erasure ranking
    "knn_ivfpq_erase": (["q_id BIGINT", "n_id BIGINT", "sim DOUBLE", "rank BIGINT"], "q_id, rank"),
    # HLL++ registers are JVM-side but order-insensitive (register max) →
    # deterministic; the sketch-vs-exact error record is the green
    # corpus_profile_sketch_error pin, exact companion corpus_profile_exact
    "corpus_sketch_profile": (["source VARCHAR", "approx_distinct_texts BIGINT",
                               "p50_chars BIGINT", "p95_chars BIGINT"], "source"),
    # the erased-maintained-root serve (frozen model, per-dir lists
    # anti-join); rebuild-without-victims equality is asserted in
    # CompactionSpec — the pin freezes the post-erasure ranking
    "stream_knn_erase": (["q_id BIGINT", "rank BIGINT", "n_id BIGINT", "sim DOUBLE"],
                         "q_id, rank"),
    # candidate-cap recall price at a TIGHT cap (1/doc): candidate ranking
    # is xxhash-evidence JVM-side; the lossless generous-cap serves share
    # the full bipartite DuckDB oracles (simjoin_capped_serve,
    # dedup_minhash_capped)
    "simjoin_capped_loss_audit": (["n_pairs_full BIGINT", "n_pairs_capped BIGINT",
                                   "n_lost BIGINT", "loss_ratio DOUBLE"], "n_pairs_full"),
    "knn_rebuild_gate": (["branch VARCHAR", "min_recall DOUBLE", "rebuilt BIGINT",
                          "dest_created BIGINT", "n_serve_rows BIGINT"], "branch"),
    "simjoin_probe_budget_loss_audit": (["n_pairs_full BIGINT", "n_pairs_capped BIGINT",
                                         "n_lost BIGINT", "loss_ratio DOUBLE"], "n_pairs_full"),
    "dedup_minhash_probe_budget_loss_audit": (["n_pairs_full BIGINT", "n_pairs_capped BIGINT",
                                               "n_lost BIGINT", "loss_ratio DOUBLE"], "n_pairs_full"),
    "dedup_minhash_capped_loss_audit": (["n_pairs_full BIGINT", "n_pairs_capped BIGINT",
                                         "n_lost BIGINT", "loss_ratio DOUBLE"], "n_pairs_full"),
    # frozen-vs-rebuilt recall@5 over the maintained IVF-PQ root (training
    # is id-seeded k-means, encode hash-free → deterministic); the planted
    # drift-and-recovery proof is in IvfPqIndexSpec
    "knn_maintained_recall_audit": (["model VARCHAR", "n_truth BIGINT",
                                     "n_hits BIGINT", "recall_at_k DOUBLE"], "model"),
    # the rebuilt serving generation (rebuildIvfPqMaintained → fresh
    # static root); rebuilt-equals-from-scratch is asserted in
    # IncrementalSpec — the pin freezes the rebuilt serve itself
    "knn_maintained_rebuild": (["q_id BIGINT", "rank BIGINT", "n_id BIGINT",
                                "sim DOUBLE"], "q_id, rank"),
    # shingle hashes are JVM-side xxhash64 → candidate counts not DuckDB-
    # expressible; the decay RATIO is the measured pruning evidence for
    # the frozen rarity order (exact pair set asserted by the shared
    # simjoin oracles; fresh-order equivalence in SimJoinSpec)
    "simjoin_maintained_prune_audit": (["n_candidates_frozen BIGINT",
                                        "n_candidates_fresh BIGINT",
                                        "candidate_ratio DOUBLE",
                                        "n_pairs BIGINT"], "n_pairs"),
}


def sql_lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)  # shortest roundtrip repr
    return str(v)


def pin(verify_dir, name, cols, order_by):
    con = duckdb.connect()
    colnames = [c.split()[0] for c in cols]
    rows = con.execute(
        f"SELECT {', '.join(colnames)} FROM read_parquet('{verify_dir}/{name}/*.parquet') "
        f"ORDER BY {order_by}").fetchall()
    values = ", ".join("(" + ", ".join(sql_lit(v) for v in r) + ")" for r in rows)
    casts = ", ".join(f"CAST({c.split()[0]} AS {c.split()[1]}) AS {c.split()[0]}" for c in cols)
    sql = (f"SELECT {casts} FROM (VALUES {values}) "
           f"t({', '.join(colnames)}) ORDER BY {order_by}")
    return sql, len(rows)


def main():
    verify_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf001"
    entries = []
    for name, (cols, order_by) in PINS.items():
        sql, n = pin(verify_dir, name, cols, order_by)
        print(f"pinned {name}: {n} rows, {len(sql)} chars", file=sys.stderr)
        # \n must survive as an escape in the Scala literal (a bare newline
        # breaks the string); DuckDB receives a real newline inside its
        # quoted SQL literal either way
        escaped = (sql.replace('\\', '\\\\').replace('"', '\\"')
                   .replace('\n', '\\n').replace('\r', '\\r').replace('\t', '\\t'))
        entries.append(f'    "{name}" ->\n      "{escaped}",')
    body = "\n\n".join(entries)
    scala = f'''package graft

/** PINNED literal-VALUES oracles for the deterministic queries whose
  * value logic is Spark-side (xxhash64 chains, SimHash, the media
  * decoders' features) and therefore not recomputable in DuckDB SQL.
  *
  * GENERATED by `tools/pin_oracles.py` from a verified sf=0.01 Verify dump
  * — valid ONLY at sf0.01, the driver's correctness scale. The pins turn
  * rows-only checks into exact value regression gates; first-principles
  * correctness of each operator is covered in the specs (DedupSpec HOF
  * bit-equality, TextAnalysisSpec/MultimodalSpec/SamplingSpec driver-side
  * recomputation). Regenerate after any INTENDED change to these operators.
  */
object PinnedOracles {{
  val sql: Map[String, String] = Map(
{body}
  )
}}
'''
    out = "src/main/scala/graft/PinnedOracles.scala"
    with open(out, "w") as f:
        f.write(scala)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
