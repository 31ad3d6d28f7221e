#!/usr/bin/env python3
"""Adversarial-corpus cross-engine fuzz (dev tool, driver-side python):
builds a scratch SF dir whose `documents` table is packed with the inputs
most likely to make Spark and DuckDB disagree — empty/whitespace-only
texts, non-Latin-1 scripts (CJK/Greek/Cyrillic, exercising the 2^37
shingle-token packing), emoji, embedded newlines/tabs, single-trigram
saturation, megabyte repeats, identical texts across scopes, and dense
near-dup template clusters — then replays the text/dedup query family
through the SAME Spark-vs-DuckDB gate as tools/oracle_check.py.

Usage: python3 tools/fuzz_docs.py [seed] [--only name,...]
Non-documents tables are copied from sf0.001 so every registered query
still *runs*; only the text family is gated by default.
"""
import os, random, shutil, subprocess, sys

SEED = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1
BASE = "/root/testdata/sf0.001"
DIR = f"/root/repo/scratch/fuzz{SEED}"

# text/dedup queries whose oracles read ONLY `documents` — join-based
# queries (similarity family etc.) would pass trivially on a corpus whose
# ids no longer match embeddings, so they are not gated here.
#
# Deliberately excluded: dedup_fuzzy_blocked (DuckDB's levenshtein() is
# BYTE-based while Spark's is codepoint-based — '内' vs '內' is distance 1
# in Spark, 2 in DuckDB — so cross-engine edit-distance parity is only
# possible for ASCII corpora; the Spark-side exactness contract is proven
# by FuzzyPassJoinSpec's randomized brute-force instead).
TEXT_QUERIES = """
dedup_exact dedup_minhash_lsh dedup_simhash dedup_jaccard_prefix
dedup_containment_prefix dedup_containment_mark dedup_containment_lsh
dedup_winnow dedup_winnow_pairs
dedup_substring_spans dedup_substring_clean dedup_spans dedup_span_merge
dedup_span_fraction dedup_components dedup_cluster_keep dedup_cluster_best
dedup_cluster_central dedup_report dedup_kcore
text_langid text_quality text_tokens text_entropy text_repetition
text_lm_score gopher_rules pii_redact boilerplate_filter chunk_overlap
bpe_train bpe_segment bpe_doc_tokens bpe_oov tfidf_vector bm25_score
bm25_retrieve pmi_collocations keyphrase_rank corpus_ngram_topk
corpus_inverted_index corpus_data_card token_percentiles
decontam_ngram decontam_fraction decontam_bloom
dataset_fingerprint dataset_fingerprint_fields
quality_percentile_filter sample_fixed_k sample_stratified
pack_sequences shard_manifest webdataset_shards sketch_kmv
sketch_kmv_jaccard sketch_hll sketch_bloom sketch_countmin
""".split()


def build_corpus(seed: int):
    rnd = random.Random(seed)
    docs = []
    did = 0

    def add(text, lang="en", source="web"):
        nonlocal did
        docs.append((did, text, lang, source, len(text)))
        did += 1

    # degenerate shapes. Two documented ORACLE CONTRACTS bound the shapes
    # here (the library itself has no such limits — the oracles do):
    # words <= 32 chars (bpe CTEs' BpeMaxWordLen positional explode) and
    # docs <= 256 tokens (dedup_substring capchk guard); exceeding either
    # makes the ORACLE (not Spark) bail loudly by design.
    add("")
    add(" ")
    add("\t\n  \n")
    add("a")
    add("ab")
    add("aaa" * 7)                       # single saturated trigram
    add(("ab" * 12 + " ") * 250)         # periodic 24-char words, 250 tokens
    add("word " * 250)                   # 1-token-periodic text
    add("line one\nline two\twith tab\nline one")
    # non-Latin-1 scripts — shingle keys beyond 8 bits/char
    add("这是一个测试文档 重复 重复 重复 的内容", lang="zh")
    add("这是一个测试文档 重复 重复 重复 的內容", lang="zh")   # near-dup
    add("αβγδ εζηθ ικλμ νξοπ ρστυ φχψω " * 3, lang="el")
    add("съешь же ещё этих мягких французских булок", lang="ru")
    add("съешь же ещё этих мягких французских булок!", lang="ru")
    add("🎉🎊 emoji 🎉🎊 soup 🎉🎊 " * 4)
    # identical text across scopes must never pair
    add("identical across scopes", source="web")
    add("identical across scopes", source="books")
    add("identical across scopes", source="wiki")
    # dense template cluster (containment/minhash stress): one base doc,
    # many supersets and light mutations in one scope
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lambda", "mu"]
    base = " ".join(rnd.choices(words, k=30))
    add(base, source="tmpl")
    for i in range(25):
        extra = " ".join(rnd.choices(words, k=rnd.randint(1, 10)))
        add(base + " " + extra, source="tmpl")
    for i in range(15):
        toks = base.split()
        toks[rnd.randrange(len(toks))] = rnd.choice(words)
        add(" ".join(toks), source="tmpl")
    # random filler across sources/langs so stats queries have mass —
    # explicit short tokens (<= 12 chars) to respect the bpe oracles'
    # 32-char word cap; doc token counts stay far under the 256 cap
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    for i in range(150):
        ntok = rnd.randint(1, 60)
        t = " ".join("".join(rnd.choice(alphabet)
                             for _ in range(rnd.randint(1, 12)))
                     for _ in range(ntok))
        add(t, lang=rnd.choice(["en", "de", "fr"]),
            source=rnd.choice(["web", "books", "wiki"]))
    return docs


def main():
    only = None
    for a in sys.argv:
        if a.startswith("--only"):
            only = a.split("=", 1)[1]
    os.makedirs(DIR, exist_ok=True)
    for t in ("region nation customer supplier part orders lineitem "
              "events embeddings").split():
        dst = f"{DIR}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy2(f"{BASE}/{t}.parquet", dst)
    import pyarrow as pa
    import pyarrow.parquet as pq
    docs = build_corpus(SEED)
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([d[4] for d in docs], pa.int64()),
    })
    dpath = f"{DIR}/documents.parquet"
    if os.path.exists(dpath):
        os.remove(dpath)
    pq.write_table(tbl, dpath)
    print(f"[fuzz] {len(docs)} adversarial docs -> {dpath}")
    names = only if only else ",".join(sorted(set(TEXT_QUERIES)))
    r = subprocess.run(
        [sys.executable, "tools/oracle_check.py", DIR, f"--only={names}"],
        cwd="/root/repo")
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
